"""IVF ANN quality/efficiency characterization: recall@k against the
exact brute-force baseline, and the candidate-pair work reduction that
makes the IVF plan the 100 TB path. Both formulations share the same
fixed-point arithmetic, so any overlap difference is purely the cell
restriction — the approximation — not numeric drift."""

from __future__ import annotations

from martian_moments_spark.catalog import load
from martian_moments_spark.llmops.similarity import topk_cosine

SF_DIR = "/root/testdata/sf0.001"
K = 5


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_ivf_recall_and_work_reduction(spark):
    emb = load(spark, SF_DIR, "embeddings")
    exact = _pairs(topk_cosine(emb, k=K))
    ivf = _pairs(topk_cosine(emb, k=K, cell_col="label"))

    recall = len(exact & ivf) / len(exact)

    n = emb.count()
    cell_sizes = [r[0] for r in emb.groupBy("label").count().select("count").collect()]
    work_ratio = sum(c * c for c in cell_sizes) / (n * n)

    print(f"ivf recall@{K}={recall:.3f} candidate-work ratio={work_ratio:.3f}")
    # Random synthetic embeddings put ~1/n_cells of true neighbors in
    # the probe cell; recall floor guards the plumbing (a broken cell
    # join would score ~0), the work ceiling guards the efficiency
    # claim (a degenerate single cell would score ~1).
    assert 0.03 <= recall <= 1.0
    assert work_ratio < 0.2
    # every vector still gets k results (cells are larger than k)
    ivf_df = topk_cosine(emb, k=K, cell_col="label")
    assert ivf_df.groupBy("id_a").count().filter("count <> 5").count() == 0


def test_multiprobe_recall_dominates_single_probe(spark):
    from martian_moments_spark.plans import load_all

    REGISTRY = load_all()
    exact = _pairs(REGISTRY["embedding_cosine_topk"].fn(spark, SF_DIR))
    single = _pairs(REGISTRY["embedding_ann_ivf"].fn(spark, SF_DIR))
    multi = _pairs(REGISTRY["embedding_ann_multiprobe"].fn(spark, SF_DIR))

    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    print(f"recall single-probe={r_single:.3f} multi-probe={r_multi:.3f}")
    # widening the probe set must never lose a neighbor already found
    assert r_multi >= r_single
    # and with 3x the candidates it should find strictly more here
    assert r_multi > r_single
