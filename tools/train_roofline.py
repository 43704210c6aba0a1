#!/usr/bin/env python
"""Derived roofline for the flagship 448^2 bf16 train step (no JAX needed).

VERDICT r2 asked for the training-throughput target to be a written
derivation, not a "~0.9x" claim. This script enumerates every layer of the
ResNet50 backbone + detection head (the reference architecture,
/root/reference/src/yolo/models.py:131-348), computes per-layer FLOPs and a
*minimum* HBM byte count for one forward+backward+update step, and converts
them to a per-layer lower-bound time

    t_layer >= max(FLOPs / PEAK_FLOPS, bytes / PEAK_BW)

summed over layers. Assumptions are deliberately OPTIMISTIC (that is what
makes the result a bound a real step cannot beat):

- bf16 activations/grads (2 B), fp32 master params + Adam moments (4 B).
- BN + ReLU are assumed perfectly fused into their convs (zero extra
  traffic); residual adds cost one extra read of the shortcut.
- Backward conv traffic counted once per tensor: read grad_out, read saved
  input (wgrad), write grad_in. dgrad+wgrad FLOPs = 2x forward.
- Optimizer: Adam reads params/grads/mu/nu and writes params/mu/nu
  (7 x 4 B per param), one pass.
- No remat (matches the b128 measurement configuration).

Peaks are TPU v5e-1: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python tools/train_roofline.py [--batch 128] [--image-size 448]
"""

from __future__ import annotations

import argparse

PEAK_FLOPS = 197e12  # bf16, v5e
PEAK_BW = 819e9      # HBM bytes/s, v5e
A = 2                # bf16 activation bytes
P4 = 4               # fp32 param/moment bytes


UNFUSED_BN = False  # set by --unfused: model XLA's real conv/BN fusion gaps


def conv_layer(name, h, w, cin, cout, k, stride, batch, residual_read=False,
               bn=True):
    ho, wo = h // stride, w // stride
    macs = batch * ho * wo * k * k * cin * cout
    fl_fwd = 2 * macs
    fl_bwd = 2 * fl_fwd  # dgrad + wgrad
    n_in = batch * h * w * cin
    n_out = batch * ho * wo * cout
    wbytes = k * k * cin * cout * A
    by_fwd = n_in * A + n_out * A + wbytes
    # bwd: read g_out, write g_in, re-read saved input (wgrad), weights again
    by_bwd = n_out * A + n_in * A + n_in * A + wbytes
    if residual_read:
        by_fwd += n_out * A  # shortcut read fused into the epilogue
    if bn and UNFUSED_BN:
        # XLA:TPU fuses elementwise chains with each other but NOT into a
        # convolution's epilogue (the same gap the int8 serving engine works
        # around, serving/engine.py). Train-mode BN therefore costs separate
        # passes over the conv output:
        #   fwd: batch-stat reduction reads y (1), normalize+scale+relu
        #        reads y and writes a (2)  -> 3 x n_out
        #   bwd: relu+BN backward reads g_out, a-mask, and y, writes g_y
        #        (4), plus the two per-channel grad reductions re-read
        #        g_out*y (amortized into the same pass)      -> 4 x n_out
        by_fwd += 3 * n_out * A
        by_bwd += 4 * n_out * A
    params = k * k * cin * cout
    return dict(name=name, flops=fl_fwd + fl_bwd, bytes=by_fwd + by_bwd,
                params=params, out=(ho, wo, cout))


def dense_layer(name, nin, nout, batch):
    macs = batch * nin * nout
    fl = 2 * macs * 3
    by = (batch * nin * A + batch * nout * A + nin * nout * A      # fwd
          + batch * nout * A + batch * nin * A + batch * nin * A   # bwd acts
          + 2 * nin * nout * A                                     # w re-read
          + nin * nout * P4)                                       # wgrad write
    return dict(name=name, flops=fl, bytes=by, params=nin * nout,
                out=(nout,))


def bottleneck(tag, h, w, cin, mid, cout, stride, batch):
    layers = [
        conv_layer(f"{tag}.conv1", h, w, cin, mid, 1, 1, batch),
        conv_layer(f"{tag}.conv2", h, w, mid, mid, 3, stride, batch),
        conv_layer(f"{tag}.conv3", h // stride, w // stride, mid, cout, 1, 1,
                   batch, residual_read=True),
    ]
    if cin != cout or stride != 1:
        layers.append(
            conv_layer(f"{tag}.down", h, w, cin, cout, 1, stride, batch)
        )
    return layers


def flagship_layers(batch, size):
    s = size
    layers = [conv_layer("stem", s, s, 3, 64, 7, 2, batch)]
    s //= 2
    # maxpool 3x3/2: elementwise traffic only
    n_in = batch * s * s * 64
    s //= 2
    layers.append(dict(name="maxpool", flops=0,
                       bytes=n_in * A + batch * s * s * 64 * A
                       + n_in * A + batch * s * s * 64 * A,  # fwd + bwd
                       params=0, out=(s, s, 64)))
    cfg = [(3, 64, 256, 1), (4, 128, 512, 2), (6, 256, 1024, 2),
           (3, 512, 2048, 2)]
    cin = 64
    for li, (nblocks, mid, cout, stride0) in enumerate(cfg, start=1):
        for b in range(nblocks):
            stride = stride0 if b == 0 else 1
            layers += bottleneck(f"layer{li}.{b}", s, s, cin, mid, cout,
                                 stride, batch)
            s //= stride
            cin = cout
    # Detection head: 4 convs (one stride 2) + fc1/fc2 (heads.py).
    layers += [
        conv_layer("head.conv1", s, s, 2048, 1024, 3, 1, batch),
        conv_layer("head.conv2", s, s, 1024, 1024, 3, 2, batch),
    ]
    s //= 2
    layers += [
        conv_layer("head.conv3", s, s, 1024, 1024, 3, 1, batch),
        conv_layer("head.conv4", s, s, 1024, 1024, 3, 1, batch),
        dense_layer("head.fc1", s * s * 1024, 4096, batch),
        dense_layer("head.fc2", 4096, 7 * 7 * 30, batch),
    ]
    return layers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=448)
    ap.add_argument("--measured", type=float, default=None,
                    help="measured img/s to compare against the bound")
    ap.add_argument("--unfused", action="store_true",
                    help="model XLA's unfused conv/BN boundary (realistic "
                         "current-compiler bound instead of the ideal one)")
    args = ap.parse_args()
    global UNFUSED_BN
    UNFUSED_BN = args.unfused

    layers = flagship_layers(args.batch, args.image_size)
    total_t = total_fl = total_by = total_p = 0.0
    groups = {}
    for lay in layers:
        t = max(lay["flops"] / PEAK_FLOPS, lay["bytes"] / PEAK_BW)
        bound = "BW" if lay["bytes"] / PEAK_BW > lay["flops"] / PEAK_FLOPS \
            else "MXU"
        total_t += t
        total_fl += lay["flops"]
        total_by += lay["bytes"]
        total_p += lay["params"]
        g = lay["name"].split(".")[0]
        acc = groups.setdefault(g, [0.0, 0.0, 0.0, ""])
        acc[0] += t
        acc[1] += lay["flops"]
        acc[2] += lay["bytes"]
        acc[3] = bound

    # Optimizer pass: Adam over all params, 7 fp32 transfers each.
    opt_bytes = total_p * 7 * P4
    t_opt = opt_bytes / PEAK_BW
    total_t += t_opt
    total_by += opt_bytes

    print(f"flagship train-step roofline @ batch {args.batch}, "
          f"{args.image_size}^2, v5e-1 (197 TF/s bf16, 819 GB/s)")
    print(f"{'stage':<10} {'ms(bound)':>10} {'GFLOP':>9} {'GB':>7} bound-by")
    for g, (t, fl, by, bound) in groups.items():
        print(f"{g:<10} {t * 1e3:>10.2f} {fl / 1e9:>9.0f} {by / 1e9:>7.2f} "
              f"{bound}")
    print(f"{'adam':<10} {t_opt * 1e3:>10.2f} {'0':>9} "
          f"{opt_bytes / 1e9:>7.2f} BW")
    print(f"\nparams: {total_p / 1e6:.1f} M")
    print(f"total:  {total_t * 1e3:.1f} ms/step  "
          f"{total_fl / 1e12:.2f} TFLOP  {total_by / 1e9:.1f} GB")
    ips = args.batch / total_t
    print(f"step roofline: {ips:,.0f} img/s/chip "
          f"(pure-MXU bound {total_fl / PEAK_FLOPS * 1e3:.1f} ms = "
          f"{args.batch / (total_fl / PEAK_FLOPS):,.0f} img/s; "
          f"pure-BW bound {total_by / PEAK_BW * 1e3:.1f} ms = "
          f"{args.batch / (total_by / PEAK_BW):,.0f} img/s)")
    if args.measured:
        print(f"measured {args.measured:,.0f} img/s = "
              f"{args.measured / ips:.2f}x of the layerwise bound")


if __name__ == "__main__":
    main()
