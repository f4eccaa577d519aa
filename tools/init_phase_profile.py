"""Internal phase profile of the stream init program (stream_setup).

The het phase profile (tools/het_phase_profile.py, BASELINE r4) showed the
init program at 21% of het wall — the largest non-fit cost — but never
said WHICH of its stages dominates.  This truncates `_init_one_blend` at
named checkpoints (`stream_setup(..., _stage=...)`; each truncated program
returns a probe scalar summing everything computed so far, so XLA cannot
DCE the stage under test) and times the cumulative programs:

  coadd      sanitize + noise_rms + chi^2 detection coadd
  kernels    + difference-kernel FFTs (match_psf ratio, kernel/grad rFFTs)
  convolved  + full-scene conv of the detection image + PSF SED/morph
  percenter  + per-center: SNR, SDSS symmetrize, monotonic projection, trim
  seds       + joint bulge/disk SED solve (2K full-scene convolutions)
  full       + slot packing (the production program)

Deltas between consecutive rows attribute wall time to each stage.

Run on TPU:  python tools/init_phase_profile.py [reps]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


STAGES = ["coadd", "kernels", "convolved", "percenter", "seds", "full"]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu.parallel import stream as stream_mod

    import bench

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    het_images, het_var, het_psfs, het_centers, het_active = \
        bench.make_heterogeneous(bench.N_HET)
    model_psf = bench._model_psf()
    dev = [jax.device_put(x) for x in (het_images, het_var, het_psfs)]
    jax.block_until_ready(dev)
    t("inputs on device")

    sl = slice(0, 128)           # one bench chunk
    out = {"reps": reps, "chunk": 128, "n_slots": bench.HET_SLOTS,
           "box_size": 59}

    def run(stage):
        r = stream_mod.stream_setup(
            dev[0][sl], dev[1][sl], dev[2][sl], het_centers[sl],
            model_psf, center_active=het_active[sl], box_size=59,
            n_slots=bench.HET_SLOTS, _stage=stage)
        return jax.block_until_ready(jax.tree.leaves(r))

    prev = 0.0
    for stage in STAGES:
        run(stage)               # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(stage)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        out[stage] = {"s": round(med, 4),
                      "delta_s": round(med - prev, 4),
                      "spread": [round(x, 4) for x in sorted(times)]}
        prev = med
        t(f"{stage}: {out[stage]}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
