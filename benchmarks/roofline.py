"""Roofline / MFU accounting for the 16x headline eval pipeline.

Builds an analytic FLOPs + HBM-bytes model of the cascade from the
architecture constants (SURVEY §6 north-star: where is the remaining
headroom and which optimization retires it), prints a per-stage table,
and — given a measured wall time — the achieved fraction of each roof.

``--train`` models the TRAINING step instead (batch 16 x 312-pt
patches at x16, ``train/model.py::train_step``): every level runs at
the fixed (B, max_num_point) patch shape (``Net._forward_train``
re-patches to one random sub-patch per element, ``upsampler.py:39-58``
in the reference), plus the interlevel skip at M = 312, the gt-pairing
top-k, the Chamfer loss, and the backward pass (matmuls x3 fwd+bwd,
one-hot gathers x2 — the scatter transpose is the same matmul, kNN
selection has no gradient).

Two FLOP counts are reported:

- *algorithmic*: the math the model definition requires;
- *implemented*: what the current TPU program actually issues — e.g.
  the in-VMEM one-hot gather is a (N*k, N_pad) matmul (rows x N_pad x
  G-padded lanes), and MXU tiles quantize every matmul up to 128-wide
  operands.

v5e peaks used (per chip): 197 TFLOP/s bf16, ~49 TFLOP/s f32-ish
(bf16x3 passes), 819 GB/s HBM.

Run anywhere: python benchmarks/roofline.py [--wall_s 1.5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_F32 = 49e12
PEAK_HBM = 819e9


def ceil_to(x, m):
    return -(-x // m) * m


def mxu_flops(m, k, n, lane=128, sub=8):
    """FLOPs the MXU actually performs for an (m,k)@(k,n) matmul after
    tile quantization.

    CAVEAT (measured, round 3): quantizing m only to the sublane (8)
    under-counts small-m matmuls.  A matmul streaming m=12..16 rows
    cannot amortize the 128x128 weight-tile loads, so on chip m
    effectively quantizes toward the full 128 tile as well — the
    "transposed" edge-conv layout this model predicted ~5x faster
    measured ~11% SLOWER at the production op (70.0 -> 78.0 ms,
    benchmarks/ec_layout_bench.py).  Treat small-m entries of this
    model as lower bounds.
    """
    return 2 * ceil_to(m, sub) * ceil_to(k, lane) * ceil_to(n, lane)


def pipeline_model(n_shape=5000, ratio=16, num_point=312, chunk=8,
                   knn=32, g=12, dense_n=3, fm_knn=5, c_in=24,
                   layout="lanes"):
    import math

    num_levels = int(math.log2(ratio))
    num_patches = max(int(n_shape / num_point * 3.0), 1)
    n_chunks = -(-num_patches // chunk)
    max_np = num_point if num_point < 312 else 312

    stages = []  # (name, alg_flops, impl_flops_bf16, impl_flops_f32, hbm_bytes)

    def add(name, alg, impl16, impl32, hbm):
        stages.append((name, alg, impl16, impl32, hbm))

    # per-chunk level batches
    level_b = []
    n_cur = num_point
    for l in range(1, num_levels + 1):
        if l == 1:
            level_b.append(chunk)
            n_cur = num_point * 2
            continue
        if n_cur > max_np:
            n_sub = int(n_cur / max_np * 5)
            level_b.append(chunk * n_sub)
        else:
            level_b.append(chunk)
        n_cur = num_point * 2 ** l

    n = max_np
    rows = n * knn
    n_pad = ceil_to(n, 128)

    ec_alg = ec16 = ec32 = ec_hbm = 0
    knn_alg = knn16 = knn32 = knn_hbm = 0
    dec_alg = dec32 = dec_hbm = 0
    for b in level_b:
        for _ in range(4):  # 4 edge convs per level
            # kNN graph: distance matrix + top_k
            knn_alg += b * 2 * n * n * c_in
            knn16 += b * mxu_flops(n, c_in, n) * 3  # HIGH = 3 passes
            knn_hbm += b * n * n * 4 * 2            # D write+read (top_k)
            # gather (one-hot in VMEM): algorithmic = data movement only
            ec_alg += b * rows * g * 2              # zn + pt add
            nmm = dense_n * (dense_n - 1) // 2
            ec_alg += b * nmm * rows * g * g * 2
            if layout == "lanes":
                # (rows, M) @ (M, G): G=12 output lanes pad to 128
                ec16 += b * 2 * mxu_flops(rows, n_pad, g)   # hi/lo passes
                ec32 += b * nmm * mxu_flops(rows, g, g)
            else:
                # transposed chain (layers.FUSED_LAYOUT): state (G, rows)
                # keeps the big axis on lanes — gather is (G, M)@(M, rows)
                # over 3 exact bf16 planes, chain matmuls (G, G)@(G, rows).
                # NOTE: this sublane-quantized count is NOT achievable on
                # chip (m=12..16 can't amortize MXU weight loads — see
                # the mxu_flops caveat); measured slower than "lanes"
                ec16 += b * 3 * mxu_flops(g, n_pad, rows)
                ec32 += b * nmm * mxu_flops(g, g, rows)
            # per-point terms (z, pt0, accs) + prep convs
            ec_alg += b * n * c_in * g * 2 * (dense_n + 2)
            ec32 += b * (dense_n + 2) * mxu_flops(n, c_in, g)
            # kernel IO: z, idx, pts, out
            ec_hbm += b * n_pad * 4 * (g * (2 * dense_n + 1) + knn)
        # interlevel skip (fm_knn sweeps in VMEM; feature gather)
        il_m = 6656  # padded shared prev set
        knn_alg += b * 2 * n * il_m * 3
        knn16 += b * fm_knn * n * il_m * 8  # sweep VPU work ~8 ops/elem
        # decode MLP: (264+L)->128->128->64->3 on n*2 points
        dn = n * 2
        for ci, co in ((266, 128), (128, 128), (128, 64), (64, 3)):
            dec_alg += b * dn * ci * co * 2
            dec32 += b * mxu_flops(dn, ci, co)
        dec_hbm += b * dn * (266 + 128 + 128 + 64 + 3) * 4 * 2

    per_chunk = dict(edgeconv=(ec_alg, ec16, ec32, ec_hbm),
                     knn_select=(knn_alg, knn16, 0, knn_hbm),
                     decode=(dec_alg, 0, dec32, dec_hbm))
    for name, (alg, i16, i32, hbm) in per_chunk.items():
        add(name, alg * n_chunks, i16 * n_chunks, i32 * n_chunks,
            hbm * n_chunks)

    # FPS: restitch (3 unified calls/chunk at padded sizes) + final
    fps_vpu = 0
    for picks, pts in ((4992, 24960),) * 3:
        fps_vpu += picks * pts * 8 * n_chunks
    fps_vpu += n_shape * ratio * (num_patches * num_point * ratio) * 8 // 16
    add("fps", fps_vpu // 8, fps_vpu, 0, 0)

    return stages


def train_step_model(batch=16, num_point=312, ratio=16, knn=32, g=12,
                     dense_n=3, fm_knn=5, c_in=24):
    """Implemented-FLOPs model of one optimizer step at the headline
    train config.  Backward multipliers: matmul terms x3 (forward + dX
    + dW), one-hot gathers x2 (the VJP's scatter-add IS the transposed
    one-hot matmul, ``ops/gather.py``), kNN/top-k selection x1 (argmin
    selections carry no gradient), elementwise ~x2 folded into HBM.
    """
    import math

    num_levels = int(math.log2(ratio))
    b, n = batch, num_point
    rows = n * knn
    n_pad = ceil_to(n, 128)
    stages = []

    def add(name, alg, impl16, impl32, hbm):
        stages.append((name, alg, impl16, impl32, hbm))

    ec_alg = ec16 = ec32 = ec_hbm = 0
    knn_alg = knn16 = knn_hbm = 0
    dec_alg = dec32 = dec_hbm = 0
    il_alg = il16 = 0
    nmm = dense_n * (dense_n - 1) // 2
    for lvl in range(1, num_levels + 1):
        for _ in range(4):  # 4 edge convs per level
            # kNN graph build: selection only, no backward
            knn_alg += b * 2 * n * n * c_in
            knn16 += b * mxu_flops(n, c_in, n) * 3      # HIGH precision
            knn_hbm += b * n * n * 4 * 2
            # neighbour gather fwd + scatter-transpose bwd (x2)
            ec_alg += b * rows * g * 2 * 2
            ec16 += b * 2 * mxu_flops(rows, n_pad, g) * 2
            # chain matmuls fwd + bwd (x3)
            ec_alg += b * nmm * rows * g * g * 2 * 3
            ec32 += b * nmm * mxu_flops(rows, g, g) * 3
            # per-point terms + prep convs, fwd + bwd
            ec_alg += b * n * c_in * g * 2 * (dense_n + 2) * 3
            ec32 += b * (dense_n + 2) * mxu_flops(n, c_in, g) * 3
            # activation chain residency (fwd save + bwd read)
            ec_hbm += b * rows * (dense_n * g + knn) * 4 * 2
        if lvl > 1:
            # interlevel skip at M = n: selection (no grad) + feature
            # gather (264-wide, one-hot fwd + scatter bwd) + weighting
            il_alg += b * 2 * n * n * 3
            il16 += b * mxu_flops(n, 3, n) * 3
            il_alg += b * n * fm_knn * 264 * 2 * 2
            il16 += b * 2 * mxu_flops(n * fm_knn, n_pad, 264) * 2
            # gt re-pairing: one seed per element, top-k over the gt set
            gt_n = num_point * ratio
            knn_alg += b * 2 * gt_n * 3
        # decode MLP on n*2 expanded points, fwd + bwd
        dn = n * 2
        for ci, co in ((266, 128), (128, 128), (128, 64), (64, 3)):
            dec_alg += b * dn * ci * co * 2 * 3
            dec32 += b * mxu_flops(dn, ci, co) * 3
        dec_hbm += b * dn * (266 + 128 + 128 + 64 + 3) * 4 * 3

    add("edgeconv", ec_alg, ec16, ec32, ec_hbm)
    add("knn_select", knn_alg, knn16, 0, knn_hbm)
    add("interlevel", il_alg, il16, 0, 0)
    add("decode", dec_alg, 0, dec32, dec_hbm)
    # Chamfer loss: pred (b, 624) vs gt (b, 1248) distance matrix,
    # HIGHEST precision, + its backward (coordinate differences)
    pn, gn = num_point * 2, num_point * 4
    cd_alg = b * 2 * pn * gn * 3 * 2
    cd16 = b * mxu_flops(pn, 3, gn) * 3 * 2
    add("chamfer", cd_alg, cd16, 0, b * pn * gn * 4)
    # Adam on ~0.3M params: 8 HBM passes over params+moments
    add("adam", 304_000 * 10, 0, 0, 304_000 * 4 * 8)
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wall_s", type=float, default=None)
    ap.add_argument("--train", action="store_true",
                    help="model the training step (one optimizer step "
                    "at batch 16 x 312 pts x16) instead of the eval "
                    "pipeline; pass --wall_s of a measured step")
    ap.add_argument("--layout", choices=("lanes", "transposed"),
                    default="lanes",
                    help="edge-conv chain layout (layers.FUSED_LAYOUT); "
                    "the transposed prediction does NOT hold on chip — "
                    "see mxu_flops caveat")
    args = ap.parse_args()

    stages = (train_step_model() if args.train
              else pipeline_model(layout=args.layout))
    tot_alg = sum(s[1] for s in stages)
    tot16 = sum(s[2] for s in stages)
    tot32 = sum(s[3] for s in stages)
    tot_hbm = sum(s[4] for s in stages)

    print(f"{'stage':<12}{'alg GFLOP':>12}{'impl bf16':>12}"
          f"{'impl f32':>12}{'HBM GB':>10}{'roof ms':>10}")
    for name, alg, i16, i32, hbm in stages:
        roof = max(i16 / PEAK_BF16 + i32 / PEAK_F32, hbm / PEAK_HBM)
        print(f"{name:<12}{alg/1e9:>12.2f}{i16/1e9:>12.2f}"
              f"{i32/1e9:>12.2f}{hbm/1e9:>10.3f}{roof*1e3:>10.2f}")
    roof_s = tot16 / PEAK_BF16 + tot32 / PEAK_F32
    roof_hbm = tot_hbm / PEAK_HBM
    print(f"{'TOTAL':<12}{tot_alg/1e9:>12.2f}{tot16/1e9:>12.2f}"
          f"{tot32/1e9:>12.2f}{tot_hbm/1e9:>10.3f}")
    print(f"compute roof {roof_s*1e3:.1f} ms   hbm roof "
          f"{roof_hbm*1e3:.1f} ms")
    if args.wall_s:
        print(f"measured {args.wall_s*1e3:.0f} ms -> "
              f"{100*tot_alg/PEAK_BF16/args.wall_s:.3f}% algorithmic MFU, "
              f"{100*max(roof_s, roof_hbm)/args.wall_s:.1f}% of the "
              f"implemented-program roof")


if __name__ == "__main__":
    main()
