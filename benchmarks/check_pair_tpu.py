"""One-shot TPU check: fused pair kernel compiles, matches merged path,
and a quick timing comparison.  Minimal eager dispatches (tunneled device).
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from sim_a_splat_tpu.ops.projection import Camera
    from sim_a_splat_tpu.ops.rasterize_cached import (
        build_tile_cache, build_static_composite, rasterize_with_cache,
    )
    from sim_a_splat_tpu.ops.rasterize_tiles import RasterConfig
    from sim_a_splat_tpu.ops.transforms import SE3

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def cloud(n, extent, smin, smax, seed):
        r = np.random.default_rng(seed)
        means = r.uniform(-extent, extent, (n, 3)).astype(np.float32)
        q = r.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        # covs from quats/scales in numpy
        w, x, y, z = q.T
        R = np.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], axis=1).reshape(n, 3, 3)
        s = r.uniform(smin, smax, (n, 3)).astype(np.float32)
        RS = R * s[:, None, :]
        covs = RS @ np.swapaxes(RS, 1, 2)
        cols = r.uniform(0, 1, (n, 3)).astype(np.float32)
        ops = r.uniform(0.3, 0.95, (n,)).astype(np.float32)
        return (jnp.asarray(means), jnp.asarray(covs), jnp.asarray(cols),
                jnp.asarray(ops))

    sm, sc, scol, sop = cloud(3000, 0.8, 0.02, 0.08, 0)
    dm, dc, dcol, dop = cloud(300, 0.4, 0.02, 0.06, 1)
    cam = Camera.from_fov(
        SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, -3.0])),
        0.8, 256, 256)

    base = RasterConfig(tile_size=16, tile_capacity=1024,
                        max_tiles_per_gaussian=16, chunk=128,
                        sigma_cutoff=3.0, backend="pallas", term_eps=1e-4)

    def make(cfg):
        @jax.jit
        def f(sm, dm, dcol, dop):
            cache = build_tile_cache(sm, sc, scol, sop, cam, cfg)
            scomp = build_static_composite(cache, cam, cfg)
            def loss(dm, dcol, dop):
                img, _ = rasterize_with_cache(
                    cache, dm, dc, dcol, dop, cam, cfg, dyn_capacity=128,
                    static_composite=scomp, dyn_max_tiles=9)
                w = jnp.linspace(0.5, 1.5, img.shape[0])[:, None, None]
                return jnp.sum(w * img ** 2), img
            (l, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                             has_aux=True)(dm, dcol, dop)
            return l, img, g
        return f

    f_fused = make(base._replace(fused_pair=True))
    f_merge = make(base._replace(fused_pair=False))

    t0 = time.time()
    lf, imf, gf = f_fused(sm, dm, dcol, dop)
    jax.block_until_ready(lf)
    log(f"fused compiled+run in {time.time() - t0:.1f}s loss={float(lf):.4f}")
    t0 = time.time()
    lm, imm, gm = f_merge(sm, dm, dcol, dop)
    jax.block_until_ready(lm)
    log(f"merge compiled+run in {time.time() - t0:.1f}s loss={float(lm):.4f}")

    di = float(jnp.max(jnp.abs(imf - imm)))
    dg = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gm))
    gmax = max(float(jnp.max(jnp.abs(b))) for b in gm)
    log(f"max img diff {di:.2e}  max grad diff {dg:.2e} (|g|max {gmax:.2e})")

    for name, f in (("fused", f_fused), ("merge", f_merge)):
        t0 = time.time()
        for _ in range(10):
            l, img, g = f(sm, dm, dcol, dop)
        jax.block_until_ready(l)
        log(f"{name}: {(time.time() - t0) * 100:.2f} ms/iter")
    assert di < 1e-3 and dg < 1e-2
    log("OK")


if __name__ == "__main__":
    main()
