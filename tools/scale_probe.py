"""Scaling probe: per-operator wall time at sf0.01 vs sf0.1 (10x the
data) on a warmed session. A time ratio near (or below) the data ratio
is linear-or-better scaling; a ratio far above it flags a super-linear
operator before a 1000-executor cluster finds it the hard way.

Usage: python tools/scale_probe.py [query ...]
Prints one JSON line per query: {"query": ..., "sec_small": ...,
"sec_big": ..., "ratio": ...} then a summary line.

Override the pair of directories with SCALE_SMALL / SCALE_BIG, e.g. the
synthetic sf1 built by tools/make_scale_fixture.py:
  SCALE_SMALL=/root/testdata/sf0.1 SCALE_BIG=/tmp/scale_sf1 \
      python tools/scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SMALL = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.01")
BIG = os.environ.get("SCALE_BIG", "/root/testdata/sf0.1")

# Default probe set: one per operator family, heaviest first.
DEFAULT = [
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_representative_pick",
    "dedup_simhash_wide_pairs",
    "text_clean_pipeline",
    "text_pack_sequences",
    "interval_overlap_join",
    "sessionize_events",
    "q1_pricing_summary",
    "q21_waiting_supplier",
    "vec_knn_euclidean",
    "multimodal_pixel_stats",
    "text_repetition_stats",
    "text_span_dedup",
    "text_vocabulary",
    "embedding_balanced_sample",
    # r10 promotions + the composed pipeline (bench-tracked; probed
    # here so the 3-rung evidence stays one command away)
    "join_key_skew_stats",
    "user_rfm_segments",
    "embedding_norm_stats",
    "prepare_training_corpus",
    # r11 promotions + the IVF probe path (its fit sample moved to the
    # content-keyed draw with realized-count dispatch in r11)
    "weighted_sample_topk",
    "lineitem_price_qty_correlation",
    "simhash_band_health",
    "vec_ivf_knn",
    # not a queries() entry (no SQL oracle by nature) — resolved from
    # operators.dedup below; the IVF-blocked semantic-dedup scale path
    "embedding_dedup_components",
]


def main():
    names = sys.argv[1:] or DEFAULT

    import __spark_entry__ as entry
    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    qs = entry.queries()

    def fn_for(name):
        if name in qs:
            return qs[name]
        # package-level operators staged ahead of their driver-window
        # rotation (self-oracle-gated in pytest) resolve by module scan
        from oasysdb_spark.operators import dedup, textops

        for mod in (dedup, textops):
            if hasattr(mod, name):
                return getattr(mod, name)
        raise KeyError(name)

    def run(name, sf_dir):
        t0 = time.time()
        fn_for(name)(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    def best2(name, sf_dir):
        # min of two timed runs, like bench.py: the shared VM shows ~2x
        # single-pass noise, and the warm number reflects the plan
        return min(run(name, sf_dir), run(name, sf_dir))

    # warm: JVM, Python workers, codegen for each query shape
    for name in names:
        run(name, SMALL)

    ratios = []
    for name in names:
        s = best2(name, SMALL)
        b = best2(name, BIG)
        ratio = round(b / s, 2) if s > 0 else None
        ratios.append(ratio)
        print(
            json.dumps(
                {"query": name, "sec_small": round(s, 3), "sec_big": round(b, 3), "ratio": ratio}
            )
        )
    ok = [r for r in ratios if r is not None]
    print(
        json.dumps(
            {
                "summary": "time ratio for 10x data (10.0 = linear; fixed "
                "per-query overhead pulls small-query ratios far below 10)",
                "median_ratio": sorted(ok)[len(ok) // 2] if ok else None,
                "max_ratio": max(ok) if ok else None,
            }
        )
    )


if __name__ == "__main__":
    main()
