"""Registry invariants for the driver's correctness gate.

The driver grades exactly the FIRST 50 entries of ``queries()`` in
registry order — a rows-only entry inside that window silently costs an
earned value-check (this happened in round 2: five oracle-green queries
sat at positions 51+ and got no gate row). These tests pin the contract.
"""

import __spark_entry__ as em

WINDOW = 50


def test_first_window_entries_are_all_oracle_backed():
    qs = list(em.queries())
    oracles = set(em.oracle_sql())
    window = qs[:WINDOW]
    missing = [k for k in window if k not in oracles]
    assert not missing, (
        f"rows-only entries inside the driver's {WINDOW}-entry gate "
        f"window (each displaces an oracle-backed check): {missing}"
    )


def test_every_oracle_has_a_query():
    qs = set(em.queries())
    dangling = [k for k in em.oracle_sql() if k not in qs]
    assert not dangling, dangling


def test_window_is_fully_used():
    """At least WINDOW oracle-backed queries exist — the gate window
    should never run below capacity again."""
    assert len(em.oracle_sql()) >= WINDOW


def test_entry_punct_literal_matches_engine():
    """__spark_entry__.PUNCT_RE must stay byte-equal to the engine's
    PUNCT_CLASS (entry keeps crawler_spark imports lazy, so the class is
    duplicated as a literal there)."""
    import __spark_entry__ as em

    from crawler_spark.functions.textops import PUNCT_CLASS

    assert em.PUNCT_RE == PUNCT_CLASS


def test_every_new_family_has_an_in_window_slot():
    """Round-5 rebalance (VERDICT r4 item 5): each family added in
    rounds 4 and 5 keeps one slot inside the driver-graded window so
    its correctness is driver-recorded, not only locally re-checked."""
    window = set(list(em.queries())[:WINDOW])
    for k in [
        # round-4 families
        "dust_canonicalize",     # DUST rewrite family
        "canonical_collapse",    # canonical-URL collapse
        "sitemap_recrawl",       # sitemap-driven freshness
        "soft_404",              # soft-404 detection
        "keyword_blocklist",     # C4 keyword blocklist
        "host_boilerplate",      # host-boilerplate removal
        # round-5 families
        "kmeans_portable",       # k-means codebook training
        "cluster_sample_portable",  # cluster-balanced (D4) sampling
        "incremental_semantic_portable",  # per-round semantic dedup
        "stream_near_dedup_h3",  # streaming hamming-1..3 near-dedup
    ]:
        assert k in window, k
