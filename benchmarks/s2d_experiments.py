"""Space-to-depth (S2D) head-conv experiments.

Full-resolution convolutions dominate the non-warp time of the FlowNet2
forward pass (profile r2: ~9-10 ms of the 16.9 ms non-warp time sits on
448x1024 tensors, much of it layout copies around low-channel convs).
The classic TPU fix is space-to-depth: re-express a full-res conv as an
EXACTLY equivalent conv on the 2x2-block-folded half-res tensor with 4x
the channels — lane utilization goes up, full-res activations (and
their layout copies) disappear.

Transforms measured here (all weight-preserving, fp-reorder exact):

  head7x7   conv1 7x7/2 pad3 (Cin -> 64)
            == S2D(x) -> conv 4x4/1, pad (2,1)x(2,1), 4Cin -> 64
  head3x3   conv0 3x3/1 pad1 (Cin -> C0) ; conv1 3x3/2 pad1 (C0 -> C1)
            == S2D(x) -> conv 3x3/1 pad1, 4Cin -> 4C0 (phase-major)
                      -> conv 2x2/1 pad (1,0)x(1,0), 4C0 -> C1

Weight index maps (phase-major S2D channel order (qy, qx, c)):
  7x7:  W2[da, db, (qy,qx,ci), o] = W[2da+qy, 2db+qx, ci, o]
        for 2da+qy in [0,7) with da in [0,4) (kernel origin shifted by
        the explicit pad; see _s2d_w_7x7).
  3x3 stride 1 (phase-major output (py,px,co)):
        W0'[da, db, (qy,qx,ci), (py,px,co)] = W0[2da+qy-py-1+1, ...]
        (derivation in _s2d_w_3x3s1).
  3x3 stride 2:
        W1'[da, db, (qy,qx,c), o] = W1[2da+qy, 2db+qx, c, o] with
        da in [0,2).

Run: python benchmarks/s2d_experiments.py [--check-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def space_to_depth(x):
    import jax.numpy as jnp

    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, h/2, w/2, qy, qx, c)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _s2d_w_7x7(w):
    """(7,7,ci,o) -> (4,4,4ci,o): phase-major (qy,qx,ci) input channels.

    Original: out(i,j) = sum_{ty,tx in [0,7)} W[ty,tx] x(2i+ty-3, 2j+tx-3)
    S2D input cell (a,b) phase (qy,qx) holds x(2a+qy, 2b+qx). Writing
    2i+ty-3 = 2(i+da-2)+qy gives ty = 2da+qy-1 for da in [0,4): ty in
    {-1..6}; taps with ty<0 are zero. Conv on S2D uses kernel 4, padding
    (2,1) per spatial dim.
    """
    import jax.numpy as jnp

    k, _, ci, o = w.shape
    assert k == 7
    w2 = jnp.zeros((4, 4, 2, 2, ci, o), w.dtype)
    for da in range(4):
        for db in range(4):
            for qy in range(2):
                for qx in range(2):
                    ty = 2 * da + qy - 1
                    tx = 2 * db + qx - 1
                    if 0 <= ty < 7 and 0 <= tx < 7:
                        w2 = w2.at[da, db, qy, qx].set(w[ty, tx])
    return w2.reshape(4, 4, 4 * ci, o)


def _s2d_w_3x3s1(w):
    """(3,3,ci,co) -> (3,3,4ci,4co): S2D-in, S2D-out (phase-major).

    out(2i+py, 2j+px) = sum_{ty,tx in [0,3)} W[ty,tx] x(2i+py+ty-1, ...).
    With x(2(i+da-1)+qy, ...): ty = 2da+qy-py-1 for da in [0,3).
    """
    import jax.numpy as jnp

    k, _, ci, co = w.shape
    assert k == 3
    w2 = jnp.zeros((3, 3, 2, 2, ci, 2, 2, co), w.dtype)
    for da in range(3):
        for db in range(3):
            for qy in range(2):
                for qx in range(2):
                    for py in range(2):
                        for px in range(2):
                            ty = 2 * da + qy - py - 1
                            tx = 2 * db + qx - px - 1
                            if 0 <= ty < 3 and 0 <= tx < 3:
                                w2 = w2.at[da, db, qy, qx, :, py, px].set(
                                    w[ty, tx]
                                )
    return w2.reshape(3, 3, 4 * ci, 4 * co)


def _s2d_w_3x3s2(w):
    """(3,3,c,o) -> (2,2,4c,o): stride-2 3x3 conv consuming S2D input.

    out(i,j) = sum_{ty,tx} W[ty,tx] x(2i+ty-1, 2j+tx-1); with
    x(2(i+da-1)+qy, ...): ty = 2da+qy-1 for da in [0,2).
    """
    import jax.numpy as jnp

    k, _, c, o = w.shape
    assert k == 3
    w2 = jnp.zeros((2, 2, 2, 2, c, o), w.dtype)
    for da in range(2):
        for db in range(2):
            for qy in range(2):
                for qx in range(2):
                    ty = 2 * da + qy - 1
                    tx = 2 * db + qx - 1
                    if 0 <= ty < 3 and 0 <= tx < 3:
                        w2 = w2.at[da, db, qy, qx].set(w[ty, tx])
    return w2.reshape(2, 2, 4 * c, o)


def head7x7_ref(w, b, x):
    from jax import lax

    y = lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.leaky_relu(y + b, 0.1)


def head7x7_s2d(w, b, x):
    from jax import lax

    x2 = space_to_depth(x)
    w2 = _s2d_w_7x7(w)
    y = lax.conv_general_dilated(
        x2, w2, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.leaky_relu(y + b, 0.1)


def head3x3_ref(w0, b0, w1, b1, x):
    from jax import lax

    y = lax.conv_general_dilated(
        x, w0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.leaky_relu(y + b0, 0.1)
    y = lax.conv_general_dilated(
        y, w1, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.leaky_relu(y + b1, 0.1)


def head3x3_s2d(w0, b0, w1, b1, x):
    import jax.numpy as jnp
    from jax import lax

    x2 = space_to_depth(x)
    w0p = _s2d_w_3x3s1(w0)
    b0p = jnp.tile(b0, 4)  # phase-major (py, px, co) -> co fastest
    y = lax.conv_general_dilated(
        x2, w0p, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.leaky_relu(y + b0p, 0.1)
    w1p = _s2d_w_3x3s2(w1)
    y = lax.conv_general_dilated(
        y, w1p, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.leaky_relu(y + b1, 0.1)


import jax  # noqa: E402  (after helper defs for readability)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--check-only", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    H, W = args.height, args.width
    rng = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "shape": [1, H, W]}

    print("== numerics (f32)", flush=True)
    for cin, label in ((6, "s"), (14, "stage2")):
        x = jnp.asarray(rng.rand(1, 128, 192, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(7, 7, cin, 64).astype(np.float32)) * 0.05
        b = jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1
        ref = np.asarray(jax.jit(head7x7_ref)(w, b, x))
        got = np.asarray(jax.jit(head7x7_s2d)(w, b, x))
        err = np.abs(ref - got).max()
        print(f"   head7x7[{label}] max|d| = {err:.2e}")
        assert err < 1e-4, err
    for cin, c0, label in ((6, 64, "sd"), (11, 64, "fuse")):
        x = jnp.asarray(rng.rand(1, 128, 192, cin).astype(np.float32))
        w0 = jnp.asarray(rng.randn(3, 3, cin, c0).astype(np.float32)) * 0.1
        b0 = jnp.asarray(rng.randn(c0).astype(np.float32)) * 0.1
        w1 = jnp.asarray(rng.randn(3, 3, c0, 64).astype(np.float32)) * 0.05
        b1 = jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1
        ref = np.asarray(jax.jit(head3x3_ref)(w0, b0, w1, b1, x))
        # S2D head emits the half-res conv1 output directly
        got = np.asarray(jax.jit(head3x3_s2d)(w0, b0, w1, b1, x))
        err = np.abs(ref - got).max()
        print(f"   head3x3[{label}] max|d| = {err:.2e}")
        assert err < 1e-4, err
    print("   all equivalent")
    if args.check_only:
        return

    print("== timing (bf16 in/out)", flush=True)
    results["variants_ms"] = {}
    for cin, label in ((14, "head7x7_c14"), (3, "head7x7_c3")):
        x = jnp.asarray(
            rng.rand(1, H, W, cin).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = (jnp.asarray(rng.randn(7, 7, cin, 64).astype(np.float32))
             * 0.05).astype(jnp.bfloat16)
        b = (jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1).astype(
            jnp.bfloat16
        )
        for name, fn in (("ref", head7x7_ref), ("s2d", head7x7_s2d)):
            ms = marginal_ms(
                lambda w_, b_, x_, t, fn=fn: fn(w_, b_, x_ + t).mean(),
                w, b, x, n_big=10,
            )
            results["variants_ms"][f"{label}_{name}"] = ms
            print(f"   {label:14s} {name:4s} {ms:7.3f} ms", flush=True)
    for cin, c0, label in ((6, 64, "head3x3_sd"), (11, 64, "head3x3_fuse")):
        x = jnp.asarray(
            rng.rand(1, H, W, cin).astype(np.float32)
        ).astype(jnp.bfloat16)
        w0 = (jnp.asarray(rng.randn(3, 3, cin, c0).astype(np.float32))
              * 0.1).astype(jnp.bfloat16)
        b0 = (jnp.asarray(rng.randn(c0).astype(np.float32)) * 0.1).astype(
            jnp.bfloat16
        )
        w1 = (jnp.asarray(rng.randn(3, 3, c0, 64).astype(np.float32))
              * 0.05).astype(jnp.bfloat16)
        b1 = (jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1).astype(
            jnp.bfloat16
        )
        for name, fn in (("ref", head3x3_ref), ("s2d", head3x3_s2d)):
            ms = marginal_ms(
                lambda w0_, b0_, w1_, b1_, x_, t, fn=fn: fn(
                    w0_, b0_, w1_, b1_, x_ + t
                ).mean(),
                w0, b0, w1, b1, x, n_big=10,
            )
            results["variants_ms"][f"{label}_{name}"] = ms
            print(f"   {label:14s} {name:4s} {ms:7.3f} ms", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "s2d_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")




def fold_reshape(x):
    """space_to_depth via reshape+transpose (models/common.py path)."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h // 2, w // 2, 4 * c)


def fold_slices(x):
    """space_to_depth via 4 strided slices + channel concat."""
    import jax.numpy as jnp

    return jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 0::2, 1::2],
         x[:, 1::2, 0::2], x[:, 1::2, 1::2]], axis=-1
    )


def fold_conv(x):
    """space_to_depth via a 2x2/2 identity-kernel conv (hardware conv
    path instead of a strided-transpose copy)."""
    import jax.numpy as jnp
    from jax import lax

    n, h, w, c = x.shape
    eye = jnp.zeros((2, 2, c, 4 * c), x.dtype)
    for qy in range(2):
        for qx in range(2):
            for ch in range(c):
                eye = eye.at[qy, qx, ch, (qy * 2 + qx) * c + ch].set(1)
    return lax.conv_general_dilated(
        x, eye, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main_folds():
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    rng = np.random.RandomState(0)
    for c in (3, 6, 12):
        x = jnp.asarray(
            rng.rand(1, 448, 1024, c).astype(np.float32)
        ).astype(jnp.bfloat16)
        want = np.asarray(jax.jit(fold_reshape)(x).astype(jnp.float32))
        for name, fn in (("reshape", fold_reshape),
                         ("slices", fold_slices), ("conv", fold_conv)):
            got = np.asarray(jax.jit(fn)(x).astype(jnp.float32))
            np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
            ms = marginal_ms(lambda a, t, fn=fn: fn(a + t).mean(), x,
                             n_big=10)
            print(f"  fold c={c:2d} {name:8s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    if "--folds" in sys.argv:
        main_folds()
        raise SystemExit(0)
    main()
