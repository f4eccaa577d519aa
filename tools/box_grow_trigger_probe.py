"""Why is box_grow a bitwise no-op on generated set 5?

tools/size_bias_grow_ab.py measured box_grow=0.1 bitwise-identical to the
default on the crowded set 5 (growth never fired) while bg_thresh=0.25
replicated its r3 size-bias win.  This probe decides between the two
possible causes:

  (a) the `can` headroom gate blocks growth (init-mask half-size base_h
      already at the physical bucket edge), or
  (b) the edge-pull trigger is simply never exceeded (the crowded-set
      size bias is POSITIVE — monotonic spread makes sources too BIG, so
      gradients do not pull flux at box edges the way a clipped extended
      source would; ref morphology.py:163-177 grows on edge pull only).

It runs the stream at box_grow in {0.1, 1e-6} plus base-half statistics:
if even 1e-6 never triggers while headroom exists, (b) is proven.

Run:  python tools/box_grow_trigger_probe.py [cpu]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    if "cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu import lite, parallel
    from scarlet_tpu.testing import api

    paths = api.bundled_blends(5)
    datas = [np.load(p, allow_pickle=True) for p in paths]
    images, variances, psfs, centers_l = [], [], [], []
    for data in datas:
        im, var = api._load_image_variance(data)
        images.append(im)
        variances.append(var)
        psfs.append(np.asarray(data["psfs"]).astype(np.float32))
        centers_l.append([(int(np.round(r["y"])), int(np.round(r["x"])))
                          for r in data["catalog"]])
    B = len(images)
    K = max(len(c) for c in centers_l)
    carr = np.zeros((B, K, 2), np.int32)
    cact = np.zeros((B, K), bool)
    for b, cs in enumerate(centers_l):
        carr[b, :len(cs)] = cs
        cact[b, :len(cs)] = True
    C, H, W = images[0].shape
    cap = max(H, W) + 1
    box = cap if cap % 2 == 1 else cap - 1
    model_psf = lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
        np.float32)

    out = {"box_size": box, "bc": box // 2, "grow_step": 5}
    for name, thr in (("thr_0.1", 0.1), ("thr_1e-6", 1e-6)):
        records, state, _, aux = parallel.deblend_device_stream(
            np.stack(images), np.stack(variances), np.stack(psfs), carr,
            model_psf, center_active=cact, box_size=box, n_slots=2 * K,
            max_iter=100, e_rel=1e-4, min_snr=30, box_grow=thr)
        bh = np.asarray(state.box_half[0])          # (B, n_slots)
        act = np.asarray(aux["slot_active"]) if "slot_active" in aux else None
        grown = bh >= 0
        out[name] = {
            "slots_grown": int(grown.sum()),
            "slots_total": int(bh.size),
            "max_box_half": int(bh.max()),
            "logL_sum": round(sum(float(r["logL"]) for r in records), 1),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

    # headroom: per-slot init-mask half size vs the physical bucket
    cfg, data, st, aux = parallel.stream_setup(
        np.stack(images), np.stack(variances), np.stack(psfs), carr,
        model_psf, center_active=cact, box_size=box, n_slots=2 * K,
        min_snr=30, box_grow=0.1)
    masks = np.asarray(data.box_masks[0])           # (B, n_slots, S, S)
    S = masks.shape[-1]
    bcy = S // 2
    on = masks > 0.5
    dy = np.abs(np.arange(S) - bcy)
    ry = (on.any(3) * dy[None, None, :]).max(2)
    rx = (on.any(2) * dy[None, None, :]).max(2)
    base_h = np.maximum(ry, rx)                     # (B, n_slots)
    has_mask = on.any((2, 3))
    can = (base_h + 5) <= bcy
    out["headroom"] = {
        "slots_with_mask": int(has_mask.sum()),
        "slots_with_headroom": int((can & has_mask).sum()),
        "base_h_median": float(np.median(base_h[has_mask])),
        "base_h_max": int(base_h[has_mask].max()),
    }
    print(f"# headroom: {out['headroom']}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
