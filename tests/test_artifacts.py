"""Session-artifact cache contract (operators/artifacts.py)."""

from __future__ import annotations

from eventlog_spark.operators import artifacts


def test_cache_hits_and_keying(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(artifacts, "_CACHE", {})
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3)

    a = artifacts.shared(spark, sf_dir, "t", build)
    b = artifacts.shared(spark, sf_dir, "t", build)
    assert a is b and calls["n"] == 1          # second call = cache hit
    artifacts.shared(spark, sf_dir, "other", build)
    assert calls["n"] == 2                      # different name = rebuild
    artifacts.shared(spark, sf_dir + "/x", "t", build)
    assert calls["n"] == 3                      # different dataset = rebuild


def test_disabled_flag_bypasses_cache(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(artifacts, "_CACHE", {})
    monkeypatch.setattr(artifacts, "ENABLED", False)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(2)

    artifacts.shared(spark, sf_dir, "t", build)
    artifacts.shared(spark, sf_dir, "t", build)
    assert calls["n"] == 2 and not artifacts._CACHE  # fresh build each time


def test_cached_values_equal_fresh_build(spark, sf_dir, monkeypatch):
    """The cache must be value-invisible: a cached artifact returns
    exactly what an uncached build returns (here: the IVF answer set)."""
    from eventlog_spark.operators.similarity import ann_ivf_probed

    monkeypatch.setattr(artifacts, "_CACHE", {})
    cached = {tuple(r) for r in ann_ivf_probed(spark, sf_dir).collect()}
    monkeypatch.setattr(artifacts, "ENABLED", False)
    fresh = {tuple(r) for r in ann_ivf_probed(spark, sf_dir).collect()}
    assert cached == fresh and cached
