"""Micro-bench: trajectory filler alone at terminate scale.

Builds a DepthVideo with N synthetic keyframes already device-resident
(no tracking) and times traj_filler over a 1x-keyframe synthetic
stream — the dominant terminate stage (scripts/profile_terminate.py
round 5: 25.5 s of the 29.1 s warm terminate @100 kf).

Usage: python -u scripts/bench_filler.py [n_kf] [reps]
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import synth_stream  # noqa: E402


def main():
    import jax.numpy as jnp

    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    H, W = 240, 808
    buf = 64
    while buf < n_kf + 24:
        buf *= 2
    cfg = VOConfig(image_size=(H, W), buffer=buf,
                   filter_thresh=0.01, keyframe_thresh=0.0,
                   warmup=12, segm_filter=True)
    sysm = VOSystem(cfg)
    v = sysm.video

    frames = list(synth_stream(n_kf, H, W))
    # fake keyframe state: poses ~ identity chain, unit disps, real
    # fnet features for frame 0 tiled (the filler only reads fmaps of
    # the BRACKETING keyframes through the update op)
    rng = np.random.RandomState(0)
    tang = 0.01 * rng.randn(n_kf, 6).astype(np.float32)
    from pvo_tpu.lie import se3
    poses = np.asarray(jax.vmap(se3.exp)(jnp.asarray(tang)))
    v.poses = v.poses.at[:n_kf].set(jnp.asarray(poses))
    v.disps = v.disps.at[:n_kf].set(1.0)
    from pvo_tpu.vo.net.droidnet import normalize_images
    fm = sysm.filterx.fnet_apply(
        sysm.filterx.params["fnet"],
        normalize_images(jnp.asarray(frames[0][1][None])))
    v.fmaps = v.fmaps.at[:n_kf].set(fm[0].astype(v.fmaps.dtype))
    v.tstamp[:n_kf] = np.arange(n_kf)
    v.counter = n_kf
    jax.block_until_ready(v.poses)

    for r in range(reps):
        t0 = time.monotonic()
        traj = sysm.traj_filler(iter(frames), sysm.filterx)
        dt = time.monotonic() - t0
        print(f"rep {r}: {dt:.2f}s for {len(traj)} poses "
              f"({n_kf} kf)", flush=True)
        assert np.isfinite(traj).all()


if __name__ == "__main__":
    main()
