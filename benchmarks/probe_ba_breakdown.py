"""Slope-timed breakdown of optimize_window's LM iteration cost.

Times: per-LM-iteration slope (iters=1 vs 7), fixed tail, and the pieces of
one iteration (residual pass / assembly / schur solve) standalone.

Run fresh: python benchmarks/probe_ba_breakdown.py
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.geometry import jacobians, se3
    from stereovision_slam_tpu.slam import backend as be
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused_loop import FusedLoopVisualOdometry

    print("backend:", jax.default_backend(), flush=True)
    T = 24
    with tempfile.TemporaryDirectory() as tmp:
        scene = os.path.join(tmp, "scene.npz")
        subprocess.run([sys.executable,
                        "/root/repo/benchmarks/render_scene.py",
                        scene, str(T), "188", "620", "circuit"],
                       check=True, capture_output=True)
        data = np.load(scene)
        lefts, rights = data["lefts"], data["rights"]
    rig = synthetic.make_stereo_rig()
    cfg = SlamConfig()
    cfg.num_features = 250
    cfg.num_features_needed_for_keyframe = 160
    cfg.lk_max_iters = 12
    vo = FusedLoopVisualOdometry(cfg, ArraySequenceDataset(
        lefts, rights, list(rig)), prefetch_depth=0,
        max_total_keyframes=512, max_total_landmarks=1 << 16)
    vo.initialize()
    vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                 for i in range(T)]
    for _ in range(10):
        vo.step()
    ms = vo.ms
    cam_left, cam_right = vo.cam_left, vo.cam_right
    float(np.asarray(ms.kf_pose)[0, 0, 0])
    print("active kfs:", int(np.asarray(jnp.sum(ms.kf_valid))),
          " active lms:", int(np.asarray(jnp.sum(
              ms.lm_valid & (ms.lm_obs_count > 0)))),
          " valid obs:", int(np.asarray(jnp.sum(
              ms.obs_valid & (ms.obs_lm >= 0) & ms.kf_valid[:, None]))),
          flush=True)

    def slope(label, step_fn, *args):
        ts = {}
        for KR in (4, 36):
            @jax.jit
            def reps(*a):
                return lax.fori_loop(
                    0, KR, lambda i, acc: acc + step_fn(i, *a),
                    jnp.float32(0.0))
            float(np.asarray(reps(*args)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(reps(*args)))
                best = min(best, time.perf_counter() - t0)
            ts[KR] = best
        per = (ts[36] - ts[4]) / 32
        print(f"{label:52s} {per*1e3:9.3f} ms", flush=True)
        return per

    eps = 1e-6
    for it in (1, 7):
        def ba_step(i, ms, it=it):
            ms2, _ = be.optimize_window(
                ms._replace(kf_pose=ms.kf_pose.at[0, 0, 3].add(i * eps)),
                cam_left, cam_right, chi2_th=cfg.chi2_th, iters=it,
                max_active_landmarks=1024)
            return ms2.kf_pose[0, 0, 0]
        slope(f"optimize_window iters={it}", ba_step, ms)

    # ---- pieces of one LM iteration at the solver's working set ----
    K, F = ms.obs_lm.shape
    L = ms.lm_valid.shape[0]
    La = 1024
    dtype = ms.kf_pose.dtype
    obs = be.flatten_observations(ms)
    lm_active = ms.lm_valid & (ms.lm_obs_count > 0)
    sel = jnp.nonzero(lm_active, size=La, fill_value=L)[0]
    sel_on = sel < L
    inv = jnp.full((L + 1,), -1, jnp.int32).at[
        jnp.where(sel_on, sel, L + 1)].set(
        jnp.arange(La, dtype=jnp.int32), mode="drop")
    lm_pos0 = jnp.where(sel_on[:, None], ms.lm_pos[jnp.clip(sel, 0, L - 1)], 0.0)
    obs_lm_c = inv[jnp.where(obs.lm >= 0, obs.lm, L)]
    obs_c = obs._replace(lm=obs_lm_c, valid=obs.valid & (obs_lm_c >= 0))
    O = ((obs_c.lm[:, None] == jnp.arange(La, dtype=jnp.int32)[None, :])
         & obs_c.valid[:, None]).astype(dtype)
    O = jax.device_put(O)
    huber_d2 = jnp.asarray(cfg.chi2_th**2, dtype)
    M = obs_c.kf.shape[0]
    print(f"M={M} La={La} O={O.nbytes/1e6:.1f} MB", flush=True)

    def resid(i, kf_pose, lm_pos):
        r, J_pose, J_point, in_front = be._residuals_lr(
            cam_left, cam_right, kf_pose.at[0, 0, 3].add(i * eps), lm_pos,
            obs_c, lm_onehot=O)
        return (jnp.sum(r) + jnp.sum(J_pose) + jnp.sum(J_point)
                + jnp.sum(in_front))
    slope("residual+jac pass (one-hot gather)", resid, ms.kf_pose, lm_pos0)

    r, J_pose, J_point, in_front = be._residuals_lr(
        cam_left, cam_right, ms.kf_pose, lm_pos0, obs_c, lm_onehot=O)
    c = jnp.sum(r * r, axis=-1)
    w = jacobians.huber_weight(c, huber_d2)
    w = jnp.where(obs_c.valid & in_front, w, 0.0)
    jax.block_until_ready((r, J_pose, J_point, w))

    def assemble(i, r, J_pose, J_point, w):
        H_pp, b_p, H_ll, b_l, G = be._assemble_onehot(
            r + i * eps, J_pose, J_point, w, O, K)
        return (jnp.sum(H_pp) + jnp.sum(G) + jnp.sum(H_ll)
                + jnp.sum(b_p) + jnp.sum(b_l))
    slope("normal-eq assembly (one-hot einsums)", assemble,
          r, J_pose, J_point, w)

    H_pp, b_p, H_ll, b_l, G = be._assemble_onehot(r, J_pose, J_point, w, O, K)
    kf_free = ms.kf_valid & (ms.kf_id != jnp.min(
        jnp.where(ms.kf_valid, ms.kf_id, jnp.iinfo(jnp.int32).max)))
    jax.block_until_ready((H_pp, G))

    def schur(i, H_pp, b_p, H_ll, b_l, G):
        dx_p, dx_l = be.schur_solve(H_pp + i * eps, b_p, H_ll, b_l, G,
                                    jnp.asarray(1e-4, dtype), kf_free, sel_on)
        return jnp.sum(dx_p) + jnp.sum(dx_l)
    slope("schur solve (marginalize+96x96+backsub)", schur,
          H_pp, b_p, H_ll, b_l, G)

    def chi2only(i, kf_pose, lm_pos):
        rr, _, _, inf2 = be._residuals_lr(
            cam_left, cam_right, kf_pose.at[0, 0, 3].add(i * eps), lm_pos,
            obs_c, lm_onehot=O)
        cc = jnp.sum(rr * rr, axis=-1)
        rho = jnp.where(cc <= huber_d2, cc,
                        2.0 * jnp.sqrt(huber_d2 * cc) - huber_d2)
        return jnp.sum(jnp.where(obs_c.valid & inf2, rho, 0.0))
    slope("acceptance cost pass (robust_total)", chi2only,
          ms.kf_pose, lm_pos0)


if __name__ == "__main__":
    main()
