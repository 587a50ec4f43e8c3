"""Slope-timed attribution of the keyframe-rate loop-closure hook.

The fused keyframe step (device) is ~5.4 ms against the sum of its probed
parts (~3.7 ms); this probe attributes the difference — the loop hook's
stages OUTSIDE the rarely-taken attempt branch: place embedding, ORB
descriptors, the database matvec + gates, and the DB insert writes.

Run: python benchmarks/probe_hook.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import os

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import synthetic
    from stereovision_slam_tpu.models import mobilenet_v2 as mnv2
    from stereovision_slam_tpu.models import place_net
    from stereovision_slam_tpu.ops import descriptors

    print("backend:", jax.default_backend(), flush=True)
    H, W = 188, 620
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(2, step=0.5)
    lefts, _ = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    img = jnp.asarray(np.asarray(lefts[0]), jnp.float32)
    KR_LO, KR_HI = 4, 36

    def slope(label, fn, *args):
        outs = []
        for kr in (KR_LO, KR_HI):
            f = jax.jit(lambda *a, _kr=kr: fn(_kr, *a))
            r = f(*args)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            N = 6
            for _ in range(N):
                r = f(*args)
            jax.block_until_ready(r)
            outs.append((time.perf_counter() - t0) / N)
        ms = (outs[1] - outs[0]) / (KR_HI - KR_LO) * 1e3
        print(f"{label:45s} {ms:8.3f} ms", flush=True)

    pn = place_net.get_params()
    if pn is not None:
        def pn_rep(kr, img):
            def body(i, acc):
                return acc + place_net.embed_image(pn, img + i * 1e-6)[0]
            return lax.fori_loop(0, kr, body, jnp.float32(0))
        slope("PlaceNet embed_image", pn_rep, img)

    def thumb_rep(kr, img):
        def body(i, acc):
            return acc + mnv2.embed_image_thumbnail(img + i * 1e-6)[0]
        return lax.fori_loop(0, kr, body, jnp.float32(0))
    slope("thumbnail embed", thumb_rep, img)

    F = 256
    uv = jnp.asarray(
        np.random.default_rng(0).uniform([20, 20], [W - 20, H - 20],
                                         (F, 2)), jnp.float32)
    valid = jnp.ones((F,), bool)
    pattern = jnp.asarray(descriptors._make_pattern())

    def orb_rep(kr, img, uv):
        def body(i, acc):
            d, ok = descriptors.compute(img + i * 1e-6, uv, valid,
                                        pattern=pattern)
            return acc + d[0, 0].astype(jnp.int32) + ok[0]
        return lax.fori_loop(0, kr, body, jnp.int32(0))
    slope("ORB descriptors (256 slots)", orb_rep, img, uv)

    Tdb = 512
    db = jnp.asarray(np.random.default_rng(1).normal(
        size=(Tdb, 1280)).astype(np.float32))
    emb = db[7] / jnp.linalg.norm(db[7])
    dbv = jnp.ones((Tdb,), bool)

    def scan_rep(kr, db, emb):
        def body(i, acc):
            sims = jnp.where(dbv, db @ (emb + i * 1e-9), -jnp.inf)
            best = jnp.argmax(sims)
            return acc + sims[best] + best
        return lax.fori_loop(0, kr, body, jnp.float32(0))
    slope("DB matvec + argmax (512 x 1280)", scan_rep, db, emb)

    # DB insert: 10 .at[slot].set writes on (512, ...) tables
    tabs = (jnp.zeros((Tdb, 1280)), jnp.zeros((Tdb, F, 32), jnp.uint8),
            jnp.zeros((Tdb, F), bool), jnp.zeros((Tdb, F, 2)),
            jnp.zeros((Tdb, F, 3)), jnp.zeros((Tdb, F), bool),
            jnp.zeros((Tdb, F), jnp.int32), jnp.zeros((Tdb, F), jnp.int32),
            jnp.zeros((Tdb, 3, 4)), jnp.zeros((Tdb,), bool))

    def insert_rep(kr, tabs, emb):
        def body(i, tabs):
            slot = i % Tdb
            out = []
            for t in tabs:
                val = jnp.zeros(t.shape[1:], t.dtype)
                if val.ndim and t.dtype != jnp.uint8:
                    val = val + emb[0].astype(t.dtype)
                out.append(t.at[slot].set(val))
            return tuple(out)
        return lax.fori_loop(0, kr, body, tabs)[0][0, 0]
    slope("DB insert (10 table writes)", insert_rep, tabs, emb)


if __name__ == "__main__":
    main()
