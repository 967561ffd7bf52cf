"""Trace-kernel ablation: name the binder between the VPU MT sweep and its
op-count roofline (VERDICT r4 item 1, third ask).

The production dense kernel (ops/trace_pallas.py) measured ~35% of a naive
45-op VPU roofline in round 2. This bench times LOCAL variants of the same
kernel on the same workload (in-jit reps, one dispatch) to attribute the gap:

  probe        pure FMA chain of equal op count, same shapes  -> attainable op rate
  current      the production per-lane-accumulator MT kernel (imported)
  local        local copy of `current` (sanity: must match)
  recip        1/det via pl.reciprocal(approx=False)
  recipx       1/det via pl.reciprocal(approx=True) (t precision drops!)
  nodiv        sign-trick culls (u_num vs |det|), ONE divide for t only
  bf16         all MT math in bfloat16 (measures packed-VPU headroom)
  b256/b1024   BLOCK_RAYS 256 / 1024 (per-block fixed costs + vreg locality)
  t256         TRI_TILE 256 (fewer, larger register tiles)
  mxu_hi / mxu_hi3 / mxu_lo   matmul pair math at HIGHEST / HIGH / DEFAULT

Usage (TPU): python scripts/ablate_trace_kernel.py [variants...] [--tris N]
             [--rays N] [--reps N]
Defaults run every variant at 9216 tris x 262144 rays x 8 reps.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neural_renderer_tpu.utils.compile_cache import enable as _enable

_enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_T = 1e-6
TRI_EPSILON = 1e-8


def _mt_tile(o_ref, d_ref, tb, variant: str):
    """Variant-parametrized Moeller-Trumbore tile: [3,R] rays x [9,T] tris
    -> (t, det) with t = 1e30 on reject. Mirrors trace_pallas._mt_tile_t."""
    f = (lambda x: x.astype(jnp.bfloat16)) if variant == "bf16" else (lambda x: x)
    ox, oy, oz = (f(o_ref[i, :])[:, None] for i in range(3))
    dx, dy, dz = (f(d_ref[i, :])[:, None] for i in range(3))
    rows = [f(tb[i, :])[None, :] for i in range(9)]
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = rows
    one = jnp.bfloat16(1.0) if variant == "bf16" else 1.0
    big = jnp.bfloat16(1e30) if variant == "bf16" else 1e30

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u_num = tx * px + ty * py + tz * pz
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v_num = dx * qx + dy * qy + dz * qz
    t_num = e2x * qx + e2y * qy + e2z * qz

    ok = jnp.abs(det) >= TRI_EPSILON
    if variant == "nodiv":
        # sign-trick culls: u = u_num/det in [0,1]  <=>  u_num*s in [0, |det|]
        s = jnp.where(det < 0, -one, one)
        ad = jnp.abs(det)
        us = u_num * s
        vs = v_num * s
        ok &= (us >= 0.0) & (us <= ad)
        ok &= (vs >= 0.0) & (us + vs <= ad)
        ts = t_num * s
        ok &= ts > TRI_EPSILON * ad
        t = ts / ad
        ok &= (t > TRI_EPSILON) & (t > MIN_T)
        return jnp.where(ok, t, big), det
    if variant in ("recip", "recipx"):
        inv_det = pl.reciprocal(jnp.where(ok, det, one),
                                approx=(variant == "recipx"))
    else:
        inv_det = 1.0 / jnp.where(ok, det, one)
    u = u_num * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    v = v_num * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = t_num * inv_det
    ok &= (t > TRI_EPSILON) & (t > MIN_T)
    return jnp.where(ok, t, big), det


def _probe_tile(o_ref, d_ref, tb, n_ops: int, block: int, tile: int):
    """Pure FMA chain of n_ops [block, tile] mul-adds (the op roofline)."""
    a = o_ref[0, :][:, None] * tb[0, :][None, :]
    b = d_ref[0, :][:, None] + tb[1, :][None, :]
    x = a
    for i in range(n_ops // 2):
        x = x * a + b
    return x, x


def make_kernel(variant: str, block: int, tile: int, num_tiles: int):
    bf16 = variant == "bf16"

    def kernel(o_ref, d_ref, tri_ref, out_ref):
        big = jnp.full((block, tile),
                       jnp.bfloat16(1e30) if bf16 else 1e30,
                       jnp.bfloat16 if bf16 else jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block, tile), 1)

        def body(c, state):
            bt, btri = state
            tb = tri_ref[:, pl.ds(c * tile, tile)]
            if variant == "probe":
                t, _ = _probe_tile(o_ref, d_ref, tb, 48, block, tile)
                bt = jnp.minimum(bt, t)
                return bt, btri
            t, _ = _mt_tile(o_ref, d_ref, tb, variant)
            better = t < bt
            btri = jnp.where(better, c * tile + lane, btri)
            bt = jnp.where(better, t, bt)
            return bt, btri

        bt, btri = jax.lax.fori_loop(0, num_tiles, body,
                                     (big, jnp.zeros_like(lane)))
        bt = bt.astype(jnp.float32)
        best_t = jnp.min(bt, axis=1)
        best_tri = jnp.min(jnp.where(bt <= best_t[:, None], btri,
                                     jnp.int32(2147483647)), axis=1)
        out_ref[0, :] = best_t
        out_ref[1, :] = jax.lax.bitcast_convert_type(best_tri, jnp.float32)

    return kernel


INTERPRET = os.environ.get("NR_ABLATE_INTERPRET") == "1"


@functools.partial(jax.jit, static_argnames=("variant", "block", "tile",
                                             "num_tiles"))
def trace_variant(origins, dirs, tris_packed, variant: str, block: int,
                  tile: int, num_tiles: int):
    n = origins.shape[1]
    out = pl.pallas_call(
        make_kernel(variant, block, tile, num_tiles),
        grid=(n // block,),
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, num_tiles * tile), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * num_tiles * tile * 48,
            bytes_accessed=int(n) * 32, transcendentals=0),
    )(origins, dirs, tris_packed)
    return out[0], jax.lax.bitcast_convert_type(out[1], jnp.int32)


def _mt_variant_fn(variant: str):
    """A drop-in for trace_pallas._mt_tile_t computing the `variant` math —
    used to re-trace the PRODUCTION sweep kernel with patched tile math."""
    def fn(o_ref, d_ref, tb):
        return _mt_tile(o_ref, d_ref, tb, variant)
    return fn


def run_sweep_family(variants, n, reps):
    """Time the production dual-mesh dual-facing sweep (sweep_shells_pallas,
    the headline frame's hottest kernel: 44.8 ns/ray of a ~131 ns/ray frame)
    with variant tile math patched in. Workload = the bench sphere's shells
    (2304 + 2304 tris), camera-style rays."""
    import neural_renderer_tpu.ops.trace_pallas as tp
    from make_example_scene import outward_sphere

    outer = outward_sphere(24, 48, 1.15).to_arrays()
    inner = outward_sphere(24, 48, 0.85).to_arrays()

    width = getattr(tp, 'SWEEP_TRI_TILE', tp.TRI_TILE)

    def pad_tiles(tpk):
        t = tpk.shape[1]
        pad = -(-t // width) * width - t
        return np.pad(np.asarray(tpk), ((0, 0), (0, pad)))

    to = pad_tiles(outer.tris_packed)
    ti = pad_tiles(inner.tris_packed)
    tris = jnp.asarray(np.concatenate([to, ti], axis=1))
    n_outer_tiles = to.shape[1] // width
    n_tiles = tris.shape[1] // width

    rng = np.random.default_rng(0)
    w = int(np.sqrt(n * 16 / 9))
    h = -(-n // w)
    xs = (np.arange(w) / w - 0.5) * 1.2
    ys = (np.arange(h) / h - 0.5) * 0.675
    gx, gy = np.meshgrid(xs, ys)
    d = np.stack([gx.ravel()[:n], gy.ravel()[:n], -np.ones(n)], axis=0)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = np.broadcast_to(np.array([0.0, 0.0, 3.0])[:, None], (3, n)).copy()
    oj = jnp.asarray(o, jnp.float32)
    dj = jnp.asarray(d, jnp.float32)

    ref = None
    orig_mt = tp._mt_tile_t
    for v in variants:
        name = v[len("sweep_"):] if v.startswith("sweep_") else "current"
        fwd2 = name != "nof2"
        mxu = name == "mxu"
        if name in ("nodiv", "recip", "recipx", "bf16"):
            tp._mt_tile_t = _mt_variant_fn(name)
        else:
            tp._mt_tile_t = orig_mt
        tp._sweep_shells_pallas.clear_cache()

        @jax.jit
        def run(o_in, fwd2=fwd2, mxu=mxu):
            def body(i, acc):
                out = tp.sweep_shells_pallas(o_in + acc * 1e-12, dj, tris,
                                             n_outer_tiles, n_tiles,
                                             with_fwd2=fwd2, mxu=mxu,
                                             interpret=INTERPRET)
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        try:
            float(run(oj))
        except Exception as e:
            print(f"{v:12s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            tp._mt_tile_t = orig_mt
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(oj))
            best = min(best, (time.perf_counter() - t0) / reps)
        out = np.asarray(tp.sweep_shells_pallas(
            oj, dj, tris, n_outer_tiles, n_tiles, with_fwd2=fwd2, mxu=mxu,
            interpret=INTERPRET))
        if ref is None and name == "current":
            ref = out
        err = (np.max(np.abs(np.minimum(out[:4], 1e30) -
                             np.minimum(ref[:4], 1e30)))
               if ref is not None else float("nan"))
        print(f"{v:12s}: {best * 1e3:7.2f} ms/call  "
              f"{best / n * 1e9:6.1f} ns/ray  {n / best / 1e6:7.2f} Mrays/s  "
              f"maxdiff {err:.2e}", flush=True)
        tp._mt_tile_t = orig_mt
        tp._sweep_shells_pallas.clear_cache()


def main():
    argv = sys.argv[1:]

    def opt(name, default):
        if name not in argv:
            return default
        i = argv.index(name)
        val = int(argv[i + 1])
        del argv[i:i + 2]
        return val

    num_tris = opt("--tris", 9216)
    n = opt("--rays", 262144)
    reps = opt("--reps", 8)
    args = argv

    from neural_renderer_tpu.ops.trace_pallas import (TRI_TILE,
                                                      trace_dense_pallas)
    prod_tile = TRI_TILE  # production rows must pad by the REAL constant
    from neural_renderer_tpu.ops.trace_mxu import trace_dense_mxu_pallas
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_example_scene import outward_sphere

    stacks = max(4, int((num_tris / 4) ** 0.5))
    mesh = outward_sphere(stacks, 2 * stacks, 1.0).to_arrays()
    tp = np.asarray(mesh.tris_packed)
    t_real = tp.shape[1]

    def padded(tile):
        t_pad = -(-t_real // tile) * tile
        return jnp.asarray(np.pad(tp, ((0, 0), (0, t_pad - t_real)))), \
            t_pad // tile, t_pad

    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    tgt = rng.normal(size=(n, 3)) * 0.6
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj = jnp.asarray(o.T, jnp.float32)
    dj = jnp.asarray(d.T, jnp.float32)

    tp128, tiles128, tpad128 = padded(prod_tile)
    ref_t, ref_id = trace_dense_pallas(oj, dj, tp128, 0, tiles128)
    ref_t = np.asarray(ref_t)
    ref_hit = ref_t < 1e30

    def timed(fn, label, tpad):
        @jax.jit
        def run(o_in):
            def body(i, acc):
                bt, _ = fn(o_in + acc * 1e-12)
                return acc + bt[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        try:
            float(run(oj))  # compile + warm
        except Exception as e:
            print(f"{label:8s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return None
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(oj))
            best = min(best, (time.perf_counter() - t0) / reps)
        pairs = n * tpad
        # agreement vs production
        bt, _ = fn(oj)
        bt = np.asarray(bt)
        hit = bt < 1e30
        mm = float(np.mean(hit != ref_hit))
        both = hit & ref_hit
        terr = float(np.max(np.abs(bt[both] - ref_t[both]) /
                            np.maximum(ref_t[both], 1e-6))) if both.any() else 0
        print(f"{label:8s}: {best * 1e3:7.2f} ms/call  "
              f"{best / pairs * 1e12:6.1f} ps/pair  "
              f"{n / best / 1e6:7.2f} Mrays/s   hitmm {mm:.1e} terr {terr:.1e}",
              flush=True)
        return best

    variants = args or ["current", "probe", "local", "nodiv", "recip",
                        "recipx", "bf16", "b256", "b1024", "t256",
                        "mxu_hi", "mxu_hi3", "mxu_lo", "sweep", "sweep_nof2",
                        "sweep_nodiv", "sweep_recipx", "sweep_bf16"]
    sweep_vs = [v for v in variants
                if v == "sweep" or v.startswith("sweep_")]
    variants = [v for v in variants if v not in sweep_vs]
    print(f"workload: {t_real} tris (pad {tpad128}) x {n} rays x {reps} reps")
    for v in variants:
        if v == "current":
            timed(lambda o_in: trace_dense_pallas(o_in, dj, tp128, 0,
                                                  tiles128), v, tpad128)
        elif v == "mxu_hi":
            timed(lambda o_in: trace_dense_mxu_pallas(o_in, dj, tp128, 0,
                                                      tiles128), v, tpad128)
        elif v in ("mxu_hi3", "mxu_lo"):
            prec = (jax.lax.Precision.HIGH if v == "mxu_hi3"
                    else jax.lax.Precision.DEFAULT)
            import neural_renderer_tpu.ops.trace_mxu as tm
            import jax.lax as lax
            orig = tm.pair_eval_raw

            def patched(F, tb, _prec=prec, _orig=orig):
                f_det, f_u, f_v, f_t = tm.tri_features(tb)
                dot = functools.partial(
                    lax.dot_general,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    precision=_prec,
                    preferred_element_type=jnp.float32)
                det = dot(F, f_det)
                ok = jnp.abs(det) >= TRI_EPSILON
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                u = dot(F, f_u) * inv_det
                ok &= (u >= 0.0) & (u <= 1.0)
                vv = dot(F, f_v) * inv_det
                ok &= (vv >= 0.0) & (u + vv <= 1.0)
                t = dot(F, f_t) * inv_det
                ok &= t > TRI_EPSILON
                return t, ok, det

            tm.pair_eval_raw = patched
            # the jitted wrapper caches by static args only — drop the
            # executable compiled against the unpatched pair math
            trace_dense_mxu_pallas.clear_cache()
            try:
                timed(lambda o_in: trace_dense_mxu_pallas(
                    o_in, dj, tp128, 0, tiles128, interpret=False), v, tpad128)
            finally:
                tm.pair_eval_raw = orig
                trace_dense_mxu_pallas.clear_cache()
        else:
            block, tile = 512, 128
            var = v
            if v == "b256":
                block, var = 256, "local"
            elif v == "b1024":
                block, var = 1024, "local"
            elif v == "t256":
                tile, var = 256, "local"
            elif v == "t512":
                tile, var = 512, "local"
            elif v == "b256t256":
                block, tile, var = 256, 256, "local"
            elif v == "t256probe":
                tile, var = 256, "probe"
            elif v == "t256nodiv":
                tile, var = 256, "nodiv"
            elif v == "t1024":
                tile, var = 1024, "local"
            elif v == "b1024t512":
                block, tile, var = 1024, 512, "local"
            elif v == "t512probe":
                tile, var = 512, "probe"
            tpv, tilesv, tpadv = padded(tile)
            timed(lambda o_in, var=var, block=block, tile=tile, tpv=tpv,
                  tilesv=tilesv: trace_variant(o_in, dj, tpv, var, block,
                                               tile, tilesv), v, tpadv)

    if sweep_vs:
        if "sweep" not in sweep_vs:
            sweep_vs.insert(0, "sweep")  # the diff reference
        print(f"sweep family (production dual-shell kernel, {n} rays):")
        run_sweep_family(sweep_vs, n, reps)


if __name__ == "__main__":
    main()
