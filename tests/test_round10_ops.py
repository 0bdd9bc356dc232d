"""Round-10 production-ingest operators: the distributed global rank,
Bloom-prefiltered decontamination, incremental cross-corpus near-dup,
and the quality-curriculum schedule.

The registered queries' value-level parity runs in test_oracle_parity;
these pin the operator contracts the oracles can't express: global_rank
vs the single-partition ROW_NUMBER under forced multi-partition
execution, bloom invisibility under an adversarially tiny bit table
(false positives forced, output unchanged), the cross-corpus pairer's
"never within-side" guarantee, and the arithmetic NTILE's exact match
to the SQL contract including the t < n_buckets edge.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.functions import curate, dedup
from streaming_ecom_analytics_spark.operators.prefix import global_rank


class TestGlobalRank:
    def test_equals_row_number(self, spark):
        rng = random.Random(23)
        rows = [(i, rng.randint(0, 500)) for i in range(3_000)]
        df = spark.createDataFrame(rows, "id long, v long").repartition(11)
        got = {
            r.id: r.rk
            for r in global_rank(
                df,
                order_cols=[F.desc("v"), F.asc("id")],
                out_col="rk",
                num_partitions=7,
            ).collect()
        }
        expect = {
            rid: i + 1
            for i, (rid, _) in enumerate(sorted(rows, key=lambda r: (-r[1], r[0])))
        }
        assert got == expect

    def test_empty_and_single(self, spark):
        df0 = spark.createDataFrame([], "id long, v long")
        assert global_rank(df0, order_cols=[F.asc("id")]).count() == 0
        df1 = spark.createDataFrame([(9, 1)], "id long, v long")
        out = global_rank(df1, order_cols=[F.asc("id")], out_col="rk").collect()
        assert [(r.id, r.rk) for r in out] == [(9, 1)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBloomBitmap:
    def test_no_false_negatives_and_bounded_fp(self, spark):
        from streaming_ecom_analytics_spark.functions import sketch

        n_bits, n_hashes = 1 << 14, 5
        members = spark.createDataFrame(
            [(f"key-{i}",) for i in range(500)], "k string"
        ).repartition(7)
        bm = sketch.bloom_bitmap(
            members, "k", n_bits=n_bits, n_hashes=n_hashes
        ).withColumnRenamed("bm", "__bm")
        probe_rows = [(f"key-{i}",) for i in range(500)] + [
            (f"other-{i}",) for i in range(2000)
        ]
        probes = spark.createDataFrame(probe_rows, "k string")
        member = sketch.bloom_member_expr(
            "k", "__bm", n_bits=n_bits, n_hashes=n_hashes
        )
        hits = {
            r.k for r in probes.join(F.broadcast(bm)).where(member).collect()
        }
        # one-sided error: every inserted key tests positive
        assert all(f"key-{i}" in hits for i in range(500))
        # fp rate near the analytic (1 - e^{-kn/m})^k ≈ 0.0097 here:
        # allow 3x headroom so the test pins the order of magnitude
        fp = sum(1 for k in hits if k.startswith("other-")) / 2000
        assert fp < 0.03, fp

    def test_bitmap_size_independent_of_keys(self, spark):
        from streaming_ecom_analytics_spark.functions import sketch

        small = spark.createDataFrame([("a",)], "k string")
        rows = sketch.bloom_bitmap(small, "k", n_bits=1 << 10).collect()
        assert len(rows) == 1 and len(rows[0].bm) == (1 << 10) // 64
        empty = spark.createDataFrame([], "k string")
        rows0 = sketch.bloom_bitmap(empty, "k", n_bits=1 << 10).collect()
        assert len(rows0) == 1 and all(w == 0 for w in rows0[0].bm)


CLEAN = "the quick brown fox jumps over the lazy dog near the river bank"
BENCH = "question answer pairs held out for evaluation only never train"


class TestDecontaminateBloom:
    def test_equals_plain_anti_join(self, spark):
        corpus = _docs(
            spark,
            [
                (1, CLEAN),
                (2, BENCH + " with a trailing suffix"),  # shares 4-grams
                (3, "completely unrelated text about shipping containers and ports"),
                (4, "prefix words then " + BENCH),  # shares 4-grams
            ],
        )
        bench = _docs(spark, [(100, BENCH)])
        clean = dedup.decontaminate_bloom(corpus, bench, k=4)
        assert sorted(r.doc_id for r in clean.collect()) == [1, 3]

    def test_false_positives_invisible(self, spark):
        """Adversarially tiny bit table (64 bits, 5 hashes per key →
        nearly every probe survives the bloom): the exact join must
        remove every false positive, leaving the output identical to
        the generous-filter run."""
        corpus = _docs(
            spark,
            [(i, f"unique filler text number {i} about topic {i % 7} entry") for i in range(40)]
            + [(99, BENCH)],
        )
        bench = _docs(spark, [(100, BENCH)])
        tight = dedup.decontaminate_bloom(corpus, bench, k=4, n_bits=64)
        roomy = dedup.decontaminate_bloom(corpus, bench, k=4, n_bits=1 << 20)
        t = sorted(r.doc_id for r in tight.collect())
        r_ = sorted(r.doc_id for r in roomy.collect())
        assert t == r_
        assert 99 not in t  # the true contamination is always caught

    def test_auto_bits_scales_with_suite(self):
        """Round-10 advisor: n_bits must track the benchmark shingle
        count (~10 bits/key, power of two, clamped) — a fixed table
        saturates (FP -> 1) once n_keys >> n_bits."""
        from streaming_ecom_analytics_spark.functions.dedup import _bloom_auto_bits

        assert _bloom_auto_bits(0) == 1 << 20  # floor
        assert _bloom_auto_bits(100) == 1 << 20
        assert _bloom_auto_bits(1_000_000) == 1 << 24  # 10M bits -> 16Mi
        assert _bloom_auto_bits(1_000_000_000) == 1 << 33  # clamped ceil
        for n in (1, 10**3, 10**6, 10**9):
            assert _bloom_auto_bits(n) >= min(10 * n, 1 << 33) / 2  # >=5 bits/key up to the cap

    def test_empty_benchmark_keeps_everything(self, spark):
        corpus = _docs(spark, [(1, CLEAN), (2, BENCH)])
        bench = _docs(spark, []).select(
            F.col("doc_id"), F.col("text")
        )
        out = dedup.decontaminate_bloom(corpus, bench, k=4)
        assert sorted(r.doc_id for r in out.collect()) == [1, 2]


class TestMinhashLshPairsAgainst:
    def test_matches_exact_cross_jaccard(self, spark):
        base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        new = _docs(
            spark,
            [
                (1, base_text),  # exact dup of ref 10 → jaccard 1.0
                (2, base_text + " extra"),  # near dup of ref 10
                (3, "totally different words with no shared trigrams at all"),
            ],
        )
        ref = _docs(spark, [(10, base_text), (11, "another unrelated reference doc")])
        got = {
            (r.doc_id, r.ref_id): r.jaccard
            for r in dedup.minhash_lsh_pairs_against(new, ref, k=3, threshold=0.8).collect()
        }
        assert (1, 10) in got and got[(1, 10)] == 1.0
        assert (2, 10) in got and 0.8 <= got[(2, 10)] < 1.0
        assert all(a != 3 for a, _ in got)

    def test_never_pairs_within_side(self, spark):
        """Two exact dups INSIDE the new batch and two INSIDE the
        reference: the pairer must only emit cross pairs — the
        incremental contract (delta×delta dedup is a separate,
        already-existing pass)."""
        dup = "repeated sentence used twice inside one side of the corpus"
        new = _docs(spark, [(1, dup), (2, dup)])
        ref = _docs(spark, [(10, "reference only text one two three"), (11, "reference only text one two three")])
        pairs = dedup.minhash_lsh_pairs_against(new, ref, k=3, threshold=0.8).collect()
        assert pairs == []  # no cross similarity → nothing, despite within-side dups


class TestCurriculumSchedule:
    @staticmethod
    def _reference(quality_by_id, n_buckets):
        order = sorted(quality_by_id.items(), key=lambda kv: (-kv[1], kv[0]))
        t = len(order)
        qsize, rem = divmod(t, n_buckets)
        out = {}
        for idx, (doc_id, _) in enumerate(order):
            big = (qsize + 1) * rem
            if idx < big:
                b = idx // (qsize + 1)
                pos = idx % (qsize + 1)
            else:
                b = rem + (idx - big) // qsize
                pos = (idx - big) % qsize
            out[doc_id] = (idx + 1, b + 1, pos + 1, pos * n_buckets + b)
        return out

    def test_ntile_contract_and_interleave(self, spark):
        rows = [(i, ("word " * ((i % 13) + 1)).strip()) for i in range(50)]
        df = _docs(spark, rows)
        got = curate.curriculum_schedule(df, n_buckets=4).collect()
        quality = {r.doc_id: r.quality_score for r in got}
        expect = self._reference(quality, 4)
        for r in got:
            assert (
                r.curriculum_rank,
                r.bucket,
                r.pos_in_bucket,
                r.interleave_key,
            ) == expect[r.doc_id], r.doc_id
        # bucket sizes obey NTILE: first t%n buckets one larger
        sizes = {}
        for r in got:
            sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
        assert sorted(sizes.values(), reverse=True) == [13, 13, 12, 12]
        # interleave_key is unique → a valid training order
        assert len({r.interleave_key for r in got}) == len(got)

    def test_fewer_docs_than_buckets(self, spark):
        df = _docs(spark, [(1, "one short doc"), (2, "two short docs here")])
        got = sorted(
            curate.curriculum_schedule(df, n_buckets=4).collect(),
            key=lambda r: r.curriculum_rank,
        )
        assert [r.bucket for r in got] == [1, 2]
        assert [r.pos_in_bucket for r in got] == [1, 1]
