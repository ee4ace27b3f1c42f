"""Warp-gather formulation experiments (VERDICT r1 #3).

The four full-resolution warp gathers are ~half the FlowNet2 pair time.
This harness measures candidate formulations of the bilinear gather on
the live backend and writes benchmarks/warp_results.json. Each variant
must produce identical numerics to ops/sampling.bilinear_gather (checked
at tolerance before timing).

Variants:
  naive4     four separate C-channel gathers (the pre-round-1 baseline)
  packed     ONE gather of a 12-channel 4-tap record (shipped path)
  packed_flat packed, but batch folded into the gather axis (2-D operand)
  rowpair    two gathers of (x0,x0+1)-packed 2C records (y taps separate)
  onehot_mxu row-band one-hot matmul — only if band fits; usually n/a

Run: python benchmarks/warp_experiments.py [--height 448 --width 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _coords(flow, h, w):
    import jax.numpy as jnp

    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2 = jnp.clip(xs + flow[..., 0], 0.0, w - 1)
    y2 = jnp.clip(ys + flow[..., 1], 0.0, h - 1)
    return x2, y2


def variant_naive4(image, flow):
    """Four separate gathers of C-channel pixels."""
    import jax.numpy as jnp

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = image.reshape(n, h * w, c)

    def tap(yi, xi):
        idx = (yi * w + xi).reshape(n, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w, c)

    p00 = tap(y0i, x0i)
    p01 = tap(y0i, x1i)
    p10 = tap(y1i, x0i)
    p11 = tap(y1i, x1i)
    return (
        p00 * ((1 - wx) * (1 - wy)).astype(p00.dtype)
        + p01 * (wx * (1 - wy)).astype(p00.dtype)
        + p10 * ((1 - wx) * wy).astype(p00.dtype)
        + p11 * (wx * wy).astype(p00.dtype)
    )


def variant_packed(image, flow):
    from flownet2_tf_tpu.ops.sampling import bilinear_gather

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    return bilinear_gather(image, x2, y2)


def variant_packed_flat(image, flow):
    """Packed record, but gather over a 2-D (N*H*W, 12) operand."""
    import jax.numpy as jnp

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    ip = jnp.pad(image, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    z = jnp.concatenate(
        [
            ip[:, :h, :w],
            ip[:, :h, 1 : w + 1],
            ip[:, 1 : h + 1, :w],
            ip[:, 1 : h + 1, 1 : w + 1],
        ],
        axis=-1,
    ).reshape(n * h * w, 4 * c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    idx = (y0i * w + x0i + batch_off).reshape(-1)
    g = jnp.take(z, idx, axis=0).reshape(n, h, w, 4, c)

    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    wts = jnp.stack([w00, w01, w10, w11], axis=-2)
    return jnp.sum(g * wts.astype(g.dtype), axis=-2)


def variant_rowpair(image, flow):
    """Two gathers of 2C-channel x-pair records: the y taps stay
    separate (rows y0 and y0+1), the x pair is packed."""
    import jax.numpy as jnp

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    ip = jnp.pad(image, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    zx = jnp.concatenate([ip[:, :, :w], ip[:, :, 1 : w + 1]], axis=-1)
    flat = zx.reshape(n, h * w, 2 * c)

    def tap(yi):
        idx = (yi * w + x0i).reshape(n, -1, 1)
        g = jnp.take_along_axis(flat, idx, axis=1)
        return g.reshape(n, h, w, 2, c)

    g0 = tap(y0i)  # row y0: [p00, p01]
    g1 = tap(y1i)  # row y0+1: [p10, p11]
    lerp_x = lambda g: g[..., 0, :] * (1 - wx).astype(g.dtype) \
        + g[..., 1, :] * wx.astype(g.dtype)  # noqa: E731
    r0 = lerp_x(g0)
    r1 = lerp_x(g1)
    return r0 * (1 - wy).astype(r0.dtype) + r1 * wy.astype(r0.dtype)


def variant_rowpair_flat(image, flow):
    """Two FLAT gathers of 2C-channel x-pair records. The f32 record is
    24 bytes — the same sublane-word size class where the bf16 packed
    record measured 12x faster than the 48-byte f32 one."""
    import jax.numpy as jnp

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    ip = jnp.pad(image, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    zx = jnp.concatenate([ip[:, :, :w], ip[:, :, 1 : w + 1]], axis=-1)
    flat = zx.reshape(n * h * w, 2 * c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]

    def tap(yi):
        idx = (yi * w + x0i + batch_off).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(n, h, w, 2, c)

    g0 = tap(y0i)
    g1 = tap(y1i)
    lerp_x = lambda g: g[..., 0, :] * (1 - wx).astype(g.dtype) \
        + g[..., 1, :] * wx.astype(g.dtype)  # noqa: E731
    r0 = lerp_x(g0)
    r1 = lerp_x(g1)
    return r0 * (1 - wy).astype(r0.dtype) + r1 * wy.astype(r0.dtype)


def variant_rowpair_flat1(image, flow):
    """rowpair_flat but ONE gather: both rows' indices concatenated over
    the same (N*H*W, 2C) operand — halves launch count, same traffic."""
    import jax.numpy as jnp

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    ip = jnp.pad(image, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    zx = jnp.concatenate([ip[:, :, :w], ip[:, :, 1 : w + 1]], axis=-1)
    flat = zx.reshape(n * h * w, 2 * c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    idx0 = (y0i * w + x0i + batch_off).reshape(-1)
    idx1 = (y1i * w + x0i + batch_off).reshape(-1)
    g = jnp.take(flat, jnp.concatenate([idx0, idx1]), axis=0)
    g = g.reshape(2, n, h, w, 2, c)
    lerp_x = lambda g_: g_[..., 0, :] * (1 - wx).astype(g_.dtype) \
        + g_[..., 1, :] * wx.astype(g_.dtype)  # noqa: E731
    r0 = lerp_x(g[0])
    r1 = lerp_x(g[1])
    return r0 * (1 - wy).astype(r0.dtype) + r1 * wy.astype(r0.dtype)


def variant_rowpair_flat8(image, flow):
    """rowpair_flat with the record zero-padded 6->8 elements (a full
    32-byte sublane word at f32)."""
    import jax.numpy as jnp

    n, h, w, c = image.shape
    x2, y2 = _coords(flow, h, w)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    ip = jnp.pad(image, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    zx = jnp.concatenate([ip[:, :, :w], ip[:, :, 1 : w + 1]], axis=-1)
    zx = jnp.pad(zx, ((0, 0), (0, 0), (0, 0), (0, 8 - 2 * c)))
    flat = zx.reshape(n * h * w, 8)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]

    def tap(yi):
        idx = (yi * w + x0i + batch_off).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(n, h, w, 8)

    g0 = tap(y0i)
    g1 = tap(y1i)
    lerp_x = lambda g: g[..., 0:c] * (1 - wx).astype(g.dtype) \
        + g[..., c : 2 * c] * wx.astype(g.dtype)  # noqa: E731
    r0 = lerp_x(g0)
    r1 = lerp_x(g1)
    return r0 * (1 - wy).astype(r0.dtype) + r1 * wy.astype(r0.dtype)


VARIANTS = {
    "naive4": variant_naive4,
    "packed": variant_packed,
    "packed_flat": variant_packed_flat,
    "rowpair": variant_rowpair,
    "rowpair_flat": variant_rowpair_flat,
    "rowpair_flat1": variant_rowpair_flat1,
    "rowpair_flat8": variant_rowpair_flat8,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    H, W, B = args.height, args.width, args.batch
    rng = np.random.RandomState(0)
    img32 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    flw = jnp.asarray((rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * 50)

    results = {
        "backend": jax.default_backend(),
        "shape": [B, H, W, 3],
        "variants_ms": {},
    }

    want = np.asarray(jax.jit(variant_packed)(img32, flw))
    for name, fn in VARIANTS.items():
        got = np.asarray(jax.jit(fn)(img32, flw))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5), name
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            img = img32.astype(dt)
            ms = marginal_ms(
                lambda a, f, x, fn=fn: fn(a, f + x).mean(), img, flw,
                n_big=10,
            )
            results["variants_ms"][f"{name}_{tag}"] = ms
            print(f"  {name:12s} {tag:4s} {ms:8.3f} ms", flush=True)

    # roofline context: ideal packed-table traffic at this shape
    bytes_table = B * H * W * 12 * 4  # f32 packed table, one read
    bytes_out = B * H * W * 3 * 4
    results["ideal_ms_f32_table_819GBps"] = (
        (2 * bytes_table + bytes_out) / 819e9 * 1e3
    )  # build (w+r) + gather read + out write, roughly

    out_path = os.path.join(os.path.dirname(__file__), "warp_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
