"""Quality benchmark for the speaker re-ID labeler's assignment logic.

VERDICT r3 next-step #8: the label subcommand's matching logic is
unit-tested but its clustering QUALITY was never measured.  This harness
builds a synthetic identity fixture — N identities as unit-sphere
prototypes with controlled inter-identity separation, M clips each with
controlled intra-identity embedding noise (the quantity the reference's
protocol controls through face quality / blur filtering,
reference lrs2_preprocessing/labeling.py:35-98) — and runs the EXACT
production assignment loop (weighted_mean_embedding -> match_speaker ->
running prototype refinement, data/lrs2_prep.py:label_speakers) over a
shuffled clip stream.

Metrics (standard clustering measures against ground truth):
- purity: fraction of clips whose cluster's majority identity is their own
- pairwise precision / recall / F1 over same-cluster pairs
- n_clusters vs n_identities (over/under-segmentation)

Run: python scripts/labeler_benchmark.py   (CPU, seconds)
The committed numbers live in PARITY.md §re-ID labeling.
"""

import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facegantts_tpu.data.lrs2_prep import (  # noqa: E402
    match_speaker,
    weighted_mean_embedding,
)


def make_fixture(rng, n_ident=40, clips_per=8, frames_per=6, dim=512,
                 intra_noise=0.25, inter_spread=1.0):
    """Identities on the unit sphere; clips = prototype + gaussian frame
    noise.  inter_spread < inf makes identities CORRELATED (all prototypes
    share a common component, like real face embeddings do): prototype =
    normalize(common + inter_spread * individual), so smaller inter_spread
    means closer identities and a harder assignment problem."""
    common = rng.standard_normal(dim)
    common /= np.linalg.norm(common)
    protos = []
    for _ in range(n_ident):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        v = common + inter_spread * u
        protos.append(v / np.linalg.norm(v))
    pairwise = [1.0 - protos[i] @ protos[j]
                for i in range(n_ident) for j in range(i + 1, n_ident)]
    inter_dist = float(np.mean(pairwise))
    clips = []  # (identity, frame_embeddings (F, D), frame_weights)
    for i, p in enumerate(protos):
        for _ in range(clips_per):
            # intra_noise = NORM of the per-frame deviation vector relative
            # to the unit prototype (per-dim sigma would be swamped by the
            # sqrt(dim) factor in 512-d): cos-sim to the prototype is
            # ~1/sqrt(1 + intra_noise^2) per frame, tighter after the
            # quality-weighted mean over frames_per frames
            g = rng.standard_normal((frames_per, dim))
            g *= intra_noise / np.linalg.norm(g, axis=-1, keepdims=True)
            frames = p[None, :] + g
            frames /= np.linalg.norm(frames, axis=-1, keepdims=True)
            weights = rng.uniform(0.5, 2.0, frames_per).tolist()  # "quality"
            clips.append((i, frames, weights))
    rng.shuffle(clips)
    return clips, len(protos), inter_dist


def run_assignment(clips):
    """The label_speakers loop, minus video IO (data/lrs2_prep.py:399-421)."""
    known = []
    assignment = []
    for truth, frames, weights in clips:
        mean = weighted_mean_embedding(frames, weights)
        sid, _ = match_speaker(known, mean)
        if sid < 0:
            sid = len(known)
            known.append(mean)
        else:
            known[sid] = known[sid] + 0.1 * (mean - known[sid])
            known[sid] /= np.linalg.norm(known[sid]) + 1e-8
        assignment.append((truth, sid))
    return assignment, len(known)


def score(assignment):
    by_cluster = defaultdict(list)
    for truth, sid in assignment:
        by_cluster[sid].append(truth)
    n = len(assignment)
    purity = sum(Counter(v).most_common(1)[0][1] for v in by_cluster.values()) / n

    tp = fp = fn = 0
    for i in range(n):
        for j in range(i + 1, n):
            same_t = assignment[i][0] == assignment[j][0]
            same_c = assignment[i][1] == assignment[j][1]
            tp += same_t and same_c
            fp += (not same_t) and same_c
            fn += same_t and (not same_c)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return purity, prec, rec, f1


def main():
    rng = np.random.default_rng(0)
    print(f"{'inter_spread':>12} {'inter_d':>8} {'intra_noise':>12} "
          f"{'clusters':>9} {'purity':>7} {'prec':>6} {'recall':>7} {'F1':>6}")
    rows = []
    for spread in (1.0, 0.6, 0.4, 0.3):
        for noise in (0.4, 0.8, 1.3, 2.0):
            clips, n_ident, inter_d = make_fixture(
                rng, intra_noise=noise, inter_spread=spread)
            assignment, n_clusters = run_assignment(clips)
            purity, prec, rec, f1 = score(assignment)
            rows.append((spread, inter_d, noise, n_clusters, n_ident,
                         purity, prec, rec, f1))
            print(f"{spread:>12.2f} {inter_d:>8.3f} {noise:>12.2f} "
                  f"{n_clusters:>4}/{n_ident:<4} {purity:>7.3f} "
                  f"{prec:>6.3f} {rec:>7.3f} {f1:>6.3f}")
    return rows


if __name__ == "__main__":
    main()
