"""Round-3 render schedule sweep: head_steps=0 (cone-edge-key sorted tail).

Hypothesis: after a cone-certified start, silhouette rays are identifiable
from the cone depth image alone (block-depth discontinuity), so the
convergence sort no longer needs the 2 full-width fine head steps
(~10 ms of the 38.9 ms frame). Measures the bench scene (512^3 sphere,
640x480) across schedules. Run on the real chip.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from voxelized_geometry_tools_tpu import GridSpec
from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
from voxelized_geometry_tools_tpu.ops import edt, render, sdf_query


def _force(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    n = 512
    res = 0.01
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    ax = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) ** 2
    mask = (ax[:, None, None] + ax[None, :, None]
            + ax[None, None, :]) <= 128.0 ** 2
    values = edt._sdf_values_from_mask(mask, res)
    sdf = SignedDistanceField.create(spec, values, locked=True)
    table = jax.jit(sdf_query.build_corner_table)(sdf)

    size = n * res
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (size / 2, size / 2, -1.2 * size)
    cam = render.PinholeCamera.create(pose, 640, 480, focal=600.0)
    rays = 640 * 480

    schedules = [
        dict(coarse_factor=4, head_steps=2, tail_chunks=64),   # round-2 best
        dict(coarse_factor=4, head_steps=1, tail_chunks=64),
        dict(coarse_factor=4, head_steps=1, tail_chunks=48),
        dict(coarse_factor=4, head_steps=1, tail_chunks=96),
        dict(coarse_factor=4, head_steps=1, tail_chunks=128),
        dict(coarse_factor=8, head_steps=1, tail_chunks=64),
        dict(coarse_factor=2, head_steps=1, tail_chunks=64),
        dict(coarse_factor=4, head_steps=1, tail_chunks=32),
    ]
    ref_depth = None
    results = []
    for sched in schedules:
        fn = jax.jit(lambda d, t, s=tuple(sorted(sched.items())):
                     render.render_depth(
                         sdf.replace(distances=d), cam, num_steps=64,
                         corner_table=t, early_exit=True,
                         **dict(s)).depth)
        depth = fn(sdf.distances, table)
        _force(depth)
        t0 = time.monotonic()
        for _ in range(10):
            depth = fn(sdf.distances, table)
        _force(depth)
        dt = (time.monotonic() - t0) / 10
        d_np = np.asarray(depth)
        if ref_depth is None:
            ref_depth = d_np
            exact = True
        else:
            exact = bool(np.array_equal(ref_depth, d_np))
        results.append({**sched, "ms": dt * 1e3,
                        "mrays": rays / dt / 1e6, "exact": exact})
        print(f"{sched}: {dt*1e3:.1f} ms ({rays/dt/1e6:.2f} M rays/s) "
              f"exact={exact}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
