"""Wave 150: training-batch planners pinned against direct Python
implementations — pow-2 padding waste, md5 hash-shard straggler
ratios, best-of-N selection gain, and the gradient-accumulation
table."""

import hashlib
import math
import re
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext150 import (
    _BON_N,
    _MAX_BUCKET,
    _MB_TOKENS,
    _GLOBAL_TOKENS,
    _N_SHARDS,
    q_best_of_n_quality_gain,
    q_dataloader_shard_balance,
    q_gradient_accumulation_plan,
    q_padding_waste_buckets,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "documents")
        .selectExpr("doc_id", "text", "n_chars")
        .collect()
    )


def _ntok(text):
    return len([t for t in re.split(r"\s+", text) if t])


def _bucket(n):
    for p in range(4, 14):
        if n <= (1 << p):
            return 1 << p
    return _MAX_BUCKET


def test_padding_waste_matches_reference(spark):
    rows = _docs(spark)
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        n = _ntok(r.text)
        b = _bucket(n)
        agg[b][0] += 1
        agg[b][1] += n
    out = {r.bucket: r for r in q_padding_waste_buckets(spark, SF).collect()}
    assert set(out) == set(agg)
    for b, (nd, tk) in agg.items():
        r = out[b]
        assert (r.n_docs, r.tokens) == (nd, tk)
        assert r.capacity == b * nd
        assert r.waste == b * nd - tk
        assert r.waste_pct_micro == math.floor(
            1e6 * (b * nd - tk) / (b * nd) + 0.5
        )


def test_shard_balance_matches_reference(spark):
    rows = _docs(spark)
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()[0]
        shard = "0123456789abcdef".index(h) % _N_SHARDS
        agg[shard][0] += 1
        agg[shard][1] += _ntok(r.text)
    tt = sum(v[1] for v in agg.values())
    w = len(agg)
    out = {
        r.shard: r for r in q_dataloader_shard_balance(spark, SF).collect()
    }
    assert set(out) == set(agg)
    for s, (nd, tk) in agg.items():
        r = out[s]
        assert (r.n_docs, r.tokens) == (nd, tk)
        assert r.straggler_ratio_micro == math.floor(
            1e6 * tk / (tt / w) + 0.5
        )


def test_best_of_n_matches_reference(spark):
    rows = _docs(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[r.doc_id // _BON_N].append(r.n_chars)
    full = {g: v for g, v in groups.items() if len(v) == _BON_N}
    k = len(full)
    ts = sum(sum(v) for v in full.values())
    tmx = sum(max(v) for v in full.values())
    mean_all = ts / (k * _BON_N)
    mean_best = tmx / k
    out = q_best_of_n_quality_gain(spark, SF).collect()[0]
    assert out.n_groups == k
    assert out.mean_all_milli == math.floor(1e3 * mean_all + 0.5)
    assert out.mean_best_milli == math.floor(1e3 * mean_best + 0.5)
    assert out.gain_pct_micro == math.floor(
        1e6 * (mean_best - mean_all) / mean_all + 0.5
    )
    assert out.gain_pct_micro > 0  # max-of-group must beat the mean


def test_grad_accum_matches_reference(spark):
    rows = _docs(spark)
    agg = defaultdict(int)
    for r in rows:
        agg[_bucket(_ntok(r.text))] += 1
    out = {
        r.bucket: r
        for r in q_gradient_accumulation_plan(spark, SF).collect()
    }
    assert set(out) == set(agg)
    for b, nd in agg.items():
        r = out[b]
        dpm = _MB_TOKENS // b
        assert r.n_docs == nd
        assert r.docs_per_microbatch == dpm
        assert r.n_microbatches == (nd + dpm - 1) // dpm
        assert r.accum_steps == (
            (_GLOBAL_TOKENS + _MB_TOKENS - 1) // _MB_TOKENS
        )
