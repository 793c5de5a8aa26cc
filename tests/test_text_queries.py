

def test_heaps_fixture_has_at_least_ten_docs(spark):
    # heaps_vocab_growth fans each bucket to checkpoints via
    # sequence(b, 9), which EMITS all 10 checkpoint rows even when
    # fewer than 10 buckets are populated — but the oracle's
    # checkpoint set is SELECT DISTINCT b FROM per_bucket, so a
    # corpus with n_docs < 10 would row-count-mismatch as an opaque
    # hash FAIL. Pin n_docs >= 10 on both gated sfs so a testdata
    # regen names this cause (the session's fixture-pin convention).
    from streaming_cdc_spark.tables import load

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        n = load(spark, sf_dir, "documents").count()
        assert n >= 10, (sf_dir, n)
