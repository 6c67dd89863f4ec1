"""One API over the approximate operators' recall knobs.

Every approximate operator in this package (IVF/LSH ANN, MinHash-LSH
dedup) exposes tuning parameters whose recall consequences were measured
and published (COVERAGE.md "Measured recall" table) or are analytically
exact (the banding collision formula). Users should not have to hand-tune
nprobe/bands against those tables — :func:`recall_config` maps a recall
target to a configuration dict that the corresponding operator accepts as
keyword arguments.

Two sources of truth, used honestly:

- **ANN (ivf / lsh)**: interpolation is NOT safe (recall depends on the
  data's cluster structure), so the helper only returns configurations at
  or above a PUBLISHED measured point for the worst-case corpus
  (uniform-random embeddings — real clustered embeddings do better), and
  falls back to the provably-exhaustive configuration (nprobe = nlist /
  probe_hamming = n_planes) when the target exceeds the best measured
  approximate point.
- **MinHash (minhash)**: banding recall at the Jaccard threshold is
  analytically exact — recall(J) = 1 − (1 − J^r)^b with r = num_perm/b
  rows per band (candidate generation; every candidate is exactly
  verified afterwards, so precision is 1 and the bound is the whole
  story). The helper picks the LARGEST r (fewest, widest bands — the
  cheapest candidate stream) whose analytic recall at J = threshold still
  meets the target.
"""

from __future__ import annotations

# Published measured recall on the worst-case corpus (uniform-random
# embeddings sf0.1, 64 queries, top-5 cosine; COVERAGE.md): nlist=16 IVF
# nprobe sweep. Keep in sync with tests/test_similarity.py's sweep.
_IVF_MEASURED = {4: 0.534, 8: 0.794, 12: 0.944, 16: 1.0}
_IVF_NLIST = 16
# Hyperplane LSH, 4 planes × 16 tables (COVERAGE.md): base config 0.922;
# probe_hamming = n_planes probes every bucket → exhaustive (q134).
_LSH_MEASURED = {0: 0.922}
_LSH_PLANES, _LSH_TABLES = 4, 16


def minhash_banding_recall(threshold: float, num_perm: int, bands: int) -> float:
    """Analytic candidate recall of (num_perm, bands) banding at Jaccard
    exactly ``threshold`` — 1 − (1 − t^r)^b, r = num_perm/bands. Exact,
    not an estimate; pairs above the threshold only do better."""
    if num_perm % bands:
        raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
    r = num_perm // bands
    return 1.0 - (1.0 - threshold**r) ** bands


def recall_config(kind: str, recall_target: float, **params) -> dict:
    """Configuration dict meeting ``recall_target`` for an approximate
    operator family.

    kind='ivf'     → {'nlist', 'nprobe'} for ann_ivf_topk /
                     search_ivf_index / knn_edges_approx.
    kind='lsh'     → {'n_planes', 'n_tables', 'probe_hamming'} for
                     ann_lsh_topk.
    kind='minhash' → {'num_perm', 'bands'} for minhash_dedup_pairs
                     (pass threshold=..., default 0.5; optional
                     num_perm=..., default 64).

    Raises ValueError for targets outside (0, 1].
    """
    if not 0.0 < recall_target <= 1.0:
        raise ValueError(f"recall_target must be in (0, 1], got {recall_target}")
    if kind == "ivf":
        for nprobe in sorted(_IVF_MEASURED):
            if _IVF_MEASURED[nprobe] >= recall_target:
                return {"nlist": _IVF_NLIST, "nprobe": nprobe}
        return {"nlist": _IVF_NLIST, "nprobe": _IVF_NLIST}  # exhaustive
    if kind == "lsh":
        best = max(v for v in _LSH_MEASURED.values())
        if recall_target <= best:
            return {"n_planes": _LSH_PLANES, "n_tables": _LSH_TABLES, "probe_hamming": 0}
        # past the measured frontier: the provably exhaustive configuration
        return {"n_planes": _LSH_PLANES, "n_tables": _LSH_TABLES, "probe_hamming": _LSH_PLANES}
    if kind == "minhash":
        threshold = params.get("threshold", 0.5)
        num_perm = params.get("num_perm", 64)
        divisors = [b for b in range(1, num_perm + 1) if num_perm % b == 0]
        # fewest bands (largest r) still meeting the analytic bound at J=t
        for bands in divisors:
            if minhash_banding_recall(threshold, num_perm, bands) >= recall_target:
                return {"num_perm": num_perm, "bands": bands}
        return {"num_perm": num_perm, "bands": num_perm}  # r=1: recall-1 mode (q131)
    raise ValueError(f"unknown kind {kind!r}: expected ivf | lsh | minhash")
