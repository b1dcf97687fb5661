"""Golden-file CBS validation against the reference's published example.

The reference repo ships the outputs of a real trisomy-21 NIPT run at
100 kb bins (docs/include/example.bed, referenced from README.md:112).  We
feed the published per-bin ratios through our CBS (the published per-bin
*weights* are not part of the release, so weights are 1.0) and require the
published segmentation to be reproduced almost exactly.
"""

import numpy as np

from wisecondorx_tpu.ops import cbs as cbs_ops

BINS_BED = "/root/reference/docs/include/example.bed/ID_bins.bed"
SEGMENTS_BED = "/root/reference/docs/include/example.bed/ID_segments.bed"
ABERRATIONS_BED = "/root/reference/docs/include/example.bed/ID_aberrations.bed"
BINSIZE = 100000


def _chr_index(name):
    return ({"X": 23, "Y": 24}.get(name) or int(name)) - 1


def _load_golden():
    ratios = {}
    for line in open(BINS_BED).read().strip().split("\n")[1:]:
        chr_name, _s, _e, _id, ratio, _z = line.split("\t")
        ratios.setdefault(_chr_index(chr_name), []).append(
            0.0 if ratio == "NaN" else float(ratio)
        )
    results_r = [np.array(ratios[c]) for c in range(len(ratios))]
    segments = []
    for line in open(SEGMENTS_BED).read().strip().split("\n")[1:]:
        chr_name, s, e, r, _z = line.split("\t")
        segments.append(
            (
                _chr_index(chr_name),
                (int(s) - 1) // BINSIZE,
                int(e) // BINSIZE,
                float(r),
            )
        )
    return results_r, segments


def test_golden_trisomy21_segmentation():
    results_r, golden = _load_golden()
    results_w = [np.ones(len(r)) for r in results_r]

    segs = cbs_ops.exec_cbs(
        results_r,
        results_w,
        "F",
        BINSIZE,
        cbs_ops.CBSConfig(alpha=1e-4, nperm=10000, perm_batch=256, seed=0),
    )

    assert len(segs) == len(golden) == 50

    golden_set = {(c, s, e) for c, s, e, _ in golden}
    ours_set = {(s[0], s[1], s[2]) for s in segs}
    exact = len(golden_set & ours_set)
    # 49/50 reproduce bit-exactly despite unknown golden weights; allow a
    # couple of one-bin boundary differences for robustness.
    assert exact >= len(golden) - 2, f"only {exact}/{len(golden)} exact"

    # Every golden boundary must be reproduced within 2 bins.
    def boundaries(items):
        return {(c, b) for c, s, e, *_ in items for b in (s, e)}

    ours_b = boundaries([tuple(s[:4]) for s in segs])
    for c, b in boundaries(golden):
        assert any(
            (c, bb) in ours_b for bb in range(b - 2, b + 3)
        ), f"golden boundary chr{c+1}:{b} unmatched"

    # The trisomy-21 gain (the one published aberration) must be called
    # with a closely matching ratio.
    aber = open(ABERRATIONS_BED).read().strip().split("\n")[1].split("\t")
    a_chr, a_s, a_e, a_r = (
        _chr_index(aber[0]),
        (int(aber[1]) - 1) // BINSIZE,
        int(aber[2]) // BINSIZE,
        float(aber[3]),
    )
    candidates = [
        s for s in segs
        if s[0] == a_chr and abs(s[1] - a_s) <= 1 and abs(s[2] - a_e) <= 1
    ]
    assert candidates, "trisomy-21 gain segment missing"
    assert abs(candidates[0][3] - a_r) < 0.002
