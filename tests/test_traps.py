"""Crawler-trap flag unit cases."""


def test_url_trap_flags_cases(spark):
    from crawler_spark.functions.traps import url_trap_flags

    rows = [
        (0, "http://a.test/doc/1"),                         # clean
        (1, "http://a.test/a/b/a/c/a"),                      # mirror loop
        (2, "http://a.test/2024/3/14"),                      # calendar
        (3, "http://a.test/d?sid=x1"),                       # session name
        (4, "http://a.test/d?k=0123456789abcdef0123456789abcdef"),  # hex
        (5, "http://a.test/p1/p2/p3/p4/p5/p6/p7/p8/p9?PHPSESSID=z"),
        (6, "http://a.test/d?" + "&".join(f"q{i}=1" for i in range(9))),
    ]
    df = spark.createDataFrame(rows, "i int, url string")
    got = {r.i: r for r in url_trap_flags(df).collect()}

    assert got[0].trap_score == 0 and not got[0].is_trap
    assert got[1].repeated_segments and got[1].trap_score == 1
    assert got[2].date_segments and not got[2].is_trap
    assert got[3].has_session_id and got[3].n_params == 1
    assert got[4].has_session_id  # 32-hex value, no known name
    # two combined signals cross the threshold
    assert got[5].deep_path and got[5].has_session_id and got[5].is_trap
    assert got[6].many_params and got[6].n_params == 9
    assert got[0].depth == 2 and got[5].depth == 9
