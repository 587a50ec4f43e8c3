"""Slope-timed attribution of the BATCHED serving step's marginal lane cost.

The staggered step's keyframe branch is constant in B (one m-lane
sub-batch per dispatch), so aggregate scaling is set by the vmapped
tracking path. This probe slope-times its pieces — pyramid build, the
track_step LK+pose chain — at several B to find where the marginal
~2 ms/lane (round-5 measurement) goes.

    python benchmarks/probe_batched_parts.py 1,8,16
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
    from stereovision_slam_tpu.ops import image as imops
    from stereovision_slam_tpu.slam import frontend as fe
    from stereovision_slam_tpu.slam import map_state as mapmod
    from stereovision_slam_tpu.slam.config import SlamConfig

    print("backend:", jax.default_backend(), flush=True)
    Bs = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["1", "8", "16"])]
    H, W = 188, 620
    cfg = SlamConfig()
    cfg.num_features = 250
    rig = synthetic.make_stereo_rig()
    cam_left, cam_right = rig
    poses = synthetic.forward_motion_poses(3, step=0.5)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
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
        print(f"{label:55s} {ms:8.3f} ms", flush=True)
        return ms

    for B in Bs:
        bl = jnp.asarray(np.stack([np.asarray(lefts[0])] * B))
        br = jnp.asarray(np.stack([np.asarray(rights[0])] * B))
        bl2 = jnp.asarray(np.stack([np.asarray(lefts[1])] * B))

        def mk_states():
            def one(i):
                ms = mapmod.empty_map(cfg.max_keyframes_window,
                                      cfg.max_features, cfg.max_landmarks)
                pyr = imops.build_pyramid(bl[0], cfg.lk_num_levels)
                fs = fe.init_state(cfg.max_features, pyr)
                return fs, ms
            f0, m0 = one(0)
            fs = jax.tree.map(lambda x: jnp.stack([x] * B), f0)
            ms = jax.tree.map(lambda x: jnp.stack([x] * B), m0)
            return fs, ms

        # seed a tracked state: detect + triangulate once per lane
        def seed(fs, ms):
            def one(fs, ms, l, r):
                pyr = tuple(imops.build_pyramid(l, cfg.lk_num_levels))
                rp = tuple(imops.build_pyramid(r, cfg.lk_num_levels))
                fs = fs._replace(pyr=pyr, ref_pyr=pyr)
                fs2, ms2, _, _, _ = fe.keyframe_step(
                    fs, ms, rp, cam_left, cam_right,
                    jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                    num_features=cfg.num_features, detect_all=True,
                    min_distance=cfg.gftt_min_distance,
                    quality_level=cfg.gftt_quality_level,
                    max_depth=cfg.max_triangulation_depth,
                    num_active=cfg.num_active_keyframes)
                return fs2, ms2
            return jax.vmap(one)(fs, ms, bl, br)

        fs, ms = jax.jit(seed)(*mk_states())
        jax.block_until_ready(fs.T_cur)

        def pyr_rep(kr, l, r):
            def body(i, carry):
                both = jax.vmap(lambda a, b, i=i: imops.build_pyramid_batched(
                    jnp.stack([a + i * 1e-6, b]), cfg.lk_num_levels))(l, r)
                return carry + both[-1][:, 0, 0, 0]
            return lax.fori_loop(0, kr, body, jnp.zeros(l.shape[0]))

        def track_rep(kr, fs, ms, l2):
            def body(i, carry):
                fs_c, acc = carry
                def one(fs1, ms1, img):
                    pyr = tuple(imops.build_pyramid(img + i * 1e-6,
                                                    cfg.lk_num_levels))
                    fs2, n_in, _ = fe.track_step(
                        fs1, ms1, pyr, cam_left, None, None,
                        chi2_th=cfg.chi2_th, rounds=3, iters=6, lk_iters=12)
                    return fs2, n_in
                fs2, n_in = jax.vmap(one)(fs_c, ms, l2)
                return fs_c, acc + n_in
            _, acc = lax.fori_loop(0, kr, body,
                                   (fs, jnp.zeros(l2.shape[0], jnp.int32)))
            return acc

        def track_stereo_rep(kr, fs, ms, l2, r2):
            def body(i, carry):
                fs_c, acc = carry
                def one(fs1, ms1, img, rimg):
                    both = imops.build_pyramid_batched(
                        jnp.stack([img + i * 1e-6, rimg]), cfg.lk_num_levels)
                    pyr = tuple(lv[0] for lv in both)
                    rp = tuple(lv[1] for lv in both)
                    fs2, n_in, _ = fe.track_step(
                        fs1, ms1, pyr, cam_left, rp, cam_right,
                        chi2_th=cfg.chi2_th, rounds=3, iters=6, lk_iters=12)
                    return fs2, n_in
                fs2, n_in = jax.vmap(one)(fs_c, ms, l2, r2)
                return fs_c, acc + n_in
            _, acc = lax.fori_loop(0, kr, body,
                                   (fs, jnp.zeros(l2.shape[0], jnp.int32)))
            return acc

        print(f"---- B={B}")
        slope(f"B={B} pyramids (L+R batched)", pyr_rep, bl2, br)
        slope(f"B={B} track_step mono (1 LK + pose)", track_rep, fs, ms, bl2)
        slope(f"B={B} track_step stereo (2 LK chains + pose)",
              track_stereo_rep, fs, ms, bl2, br)


if __name__ == "__main__":
    main()
