"""Device-side batched initialization: raw pixel stacks -> packed engine
state, entirely on the accelerator.

The host pipeline (`parallel.pipeline`) reproduces the reference's
per-blend Python initialization (scarlet/lite/initialization.py:321-419)
object-for-object — at ~150 ms/blend of single-core host work, which caps
end-to-end throughput far below the chip's fit throughput.  This module is
the TPU-native production path: the SAME initialization recipe (chi^2
coadd detection, SDSS symmetrization, exact weighted-monotonic projection,
threshold trim, SNR-gated bulge/disk split with joint least-squares SEDs,
PSF fallback), reformulated as one vmapped XLA program over a whole batch
of blends:

    raw (B,C,H,W) stacks -> stream_setup -> (config, BlendData, BlendState)
    -> fit_batch_device_converged -> stream_records

No per-blend host work at all: initialization, fitting, convergence, and
measurement are three compiled programs.

Algorithm parity notes (vs scarlet/lite/initialization.py):

* the monotonic projection runs on the S x S box extracted around each
  center instead of the full image.  This is EXACT, not an approximation:
  the weighted-monotonic reference graph only uses the (up to 3) neighbors
  strictly closer to the center in both coordinates, so the dependency
  cone of every box pixel lies inside the centered box
  (tests/test_stream.py checks equality against the host path);
* the trimmed logical box (initialization.trim_morphology semantics:
  threshold, centered bounding size, {21, 31, 41, ...} quantization) is
  realized as a per-slot ``box_mask`` inside the fixed physical S x S
  bucket — the same representation `pack_blends` uses;
* the bulge/disk SED least squares (lite/initialization.py:140-185) is
  solved per band in closed form (2x2 normal equations with a relative
  ridge), masked to the logical box like the reference's full_box crop.
"""
from __future__ import annotations

import logging
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fft as fft_ops
from ..ops.arrays import shift_zero as _shift
from ..ops import prox as prox_ops
from ..ops import wavelet as wavelet_ops
from ..optim import AdaproxState
from ..lite import engine
from ..initialization import get_minimal_boxsize

__all__ = ["stream_setup", "stream_records", "deblend_device_stream"]

logger = logging.getLogger("scarlet_tpu.parallel.stream")


def _upload_bandwidth_mbs(nbytes=4 << 20):
    """Idle host->device bandwidth (MB/s) from one probe transfer (the
    second of two full-size puts: the first pays the link's one-time
    bulk-path ramp).  Used by ``deblend_device_stream(upload="auto")``
    — a tunneled TPU's link varies ~40x between sessions (BASELINE
    r3/r4), so the upload strategy is worth one 4 MB measurement.

    The warmup transfer must be FULL SIZE: the tunnel's bulk path only
    ramps after a >~1 MB transfer, and a small warmup (64 KB) leaves the
    timed put reading the ~50 ms ramp cost instead of the steady rate —
    measured ~80 MB/s apparent on a 1.4 GB/s link, which pinned "auto"
    below any sensible bulk threshold (BASELINE r5 transfer-path
    mechanism study).  Note the probed rate is per-process state, not
    pure link weather: in degraded-download windows, one device fetch
    drops the process's subsequent uploads ~20x (same study), which this
    probe correctly reflects at the next stream call."""
    buf = np.zeros(nbytes, np.uint8)
    jax.device_put(buf).block_until_ready()
    t0 = time.perf_counter()
    jax.device_put(buf).block_until_ready()
    return nbytes / max(time.perf_counter() - t0, 1e-9) / 1e6


def _centered_mono_table(S, dtype=np.float32):
    """Single-candidate monotonicity table for a box with the peak AT the
    box center (init-time projection; the fit's peak-search tables come
    from engine.monotonicity_tables)."""
    from ..cache import Cache

    key = (int(S), str(np.dtype(dtype)))
    try:
        return Cache.check("stream_mono_center", key)
    except KeyError:
        pass
    c = (S // 2, S // 2)
    w = prox_ops.monotonic_weights((S, S), "angle", c).astype(dtype)
    depth = prox_ops.monotonic_depth(w, (S, S), c)
    keep = np.zeros((S, S), dtype)
    keep[c] = 1.0
    out = (w, keep, int(depth))
    Cache.set("stream_mono_center", key, out)
    return out


def _mono_project(x, w8, keep, n_iter):
    """Weighted-monotonic projection of one (S, S) image about its center:
    Jacobi iteration of ``min(X0, sum_d w_d X[shift_d])`` to the exact
    sequential-sweep fixed point (engine._prox_morph_bucket semantics,
    min_gradient=0)."""
    X0 = x
    keep_b = keep > 0.5

    def body(_, xx):
        ref = jnp.zeros_like(xx)
        for d, (dy, dx) in enumerate(prox_ops.NEIGHBOR_OFFSETS):
            ref = ref + w8[d] * _shift(xx, dy, dx)
        return jnp.where(keep_b, X0, jnp.minimum(X0, ref))

    return jax.lax.fori_loop(0, n_iter, body, X0)


def _sanitize_stacks(images, variance, xp=jnp):
    """Zero non-finite pixels, fill non-finite/negative variance with the
    per-band mean finite variance (the stream's masked-pixel rules; see
    the stream_setup comment for why).  Returns (images, variance, bad);
    ``xp`` is np for host stacks (keeps them quantizable for upload) or
    jnp for device-resident ones.  Bitwise inert on clean inputs."""
    bad = (~(xp.isfinite(images) & xp.isfinite(variance))
           | (variance < 0))
    zero = xp.zeros((), images.dtype)
    images = xp.where(bad, zero, images)
    vcnt = xp.maximum(xp.sum(~bad, axis=(-2, -1)), 1).astype(variance.dtype)
    vfill = (xp.sum(xp.where(bad, zero, variance), axis=(-2, -1))
             / vcnt)[..., None, None]
    variance = xp.where(bad, vfill, variance)
    return images, variance, bad


def _quantized_boxsize(size, cap, min_size=21, increment=10):
    """jnp version of initialization.get_minimal_boxsize: smallest
    ``min_size + k*increment`` >= size, capped at the physical box."""
    over = jnp.maximum(size - min_size, 0)
    k = (over + increment - 1) // increment
    return jnp.minimum(min_size + k * increment, cap)


def _wavelet_dictionaries(images, variance, scene_valid, n_scales,
                          bulge_scales, dtype):
    """Detection dictionaries for the wavelet init recipe, on device.

    Mirrors get_detect_wavelets (detect.py: band sum, median-sigma,
    starlet + multiresolution support) and the WaveletInitParameters
    coadds (ref lite/initialization.py:422-477): wavelets clipped at 0,
    detectlets = sum of all detail scales, bulgelets = scales[:b],
    disklets = scales[b:-1].
    """
    from .detection import _masked_median_sigma

    validb = scene_valid > 0.5
    detect_sum = jnp.where(validb, jnp.sum(images, 0), 0.0)
    # exact masked median of sqrt(variance) over valid pixels of all bands
    sigma_w = _masked_median_sigma(variance, validb)
    coeffs = wavelet_ops.starlet_transform(detect_sum, scales=n_scales)
    M = wavelet_ops.multiresolution_support_jax(
        coeffs, sigma_w, K=3, epsilon=1e-1, max_iter=20, valid=scene_valid)
    w = jnp.maximum(M.astype(dtype) * coeffs, 0.0)
    detectlets = jnp.sum(w[:-1], 0)
    bulgelets = jnp.sum(w[:bulge_scales], 0)
    disklets = jnp.sum(w[bulge_scales:-1], 0)
    return detectlets, bulgelets, disklets


def _init_one_blend(images, variance, psfs, centers, center_on,
                    model_psf, scene_valid, mono_w8, mono_keep, *, S,
                    n_slots, fft_shape, match_shape, psf_fft_shape,
                    mono_iter, min_snr, thresh, percentile, use_mask,
                    recipe="main", grow=5, n_scales=5, bulge_scales=2,
                    use_psf=True, stage="full"):
    """Initialize ONE blend (vmapped over the batch by stream_setup).

    Returns per-blend (data_leaves, state_leaves, aux) with slot-packed
    arrays at the shared (S, n_slots) layout.

    ``stage`` truncates the program at a named checkpoint for phase
    profiling (tools/init_phase_profile.py): "coadd" | "kernels" |
    "convolved" | "percenter" | "seds" | "full".  Truncated stages return
    ``(dict(probe=scalar), {}, {})`` where the scalar sums every computed
    array so XLA cannot dead-code-eliminate the stage under test.
    """
    C, H, W = images.shape

    def _probe(*arrays):
        s = jnp.zeros((), images.dtype)
        for a in arrays:
            s = s + jnp.sum(jnp.real(a)).astype(images.dtype)
        return dict(probe=s), dict(), dict()
    hS = S // 2
    dtype = images.dtype
    tiny = jnp.asarray(1e-20, dtype)
    wavelets_mode = recipe == "wavelets"

    def ratio_sed(num, den):
        # peak-ratio SED with unusable bands seeding 0: a zero/negative/
        # non-finite denominator (sparse wavelet dictionaries convolved
        # with a difference kernel's negative rings) would seed inf/NaN
        # and poison the fit.  Same guard as the host path
        # (lite.initialization._ratio_sed); bit-identical to the
        # reference's blind divide wherever the denominator is healthy.
        r = jnp.maximum(num / den, 0.0)
        return jnp.where((den > 0) & jnp.isfinite(r), r, 0.0)

    # --- observation-level quantities -------------------------------------
    # scene_valid masks caller padding (heterogeneous crops packed to one
    # (H, W)); all-ones reproduces the host path bitwise
    n_valid = jnp.maximum(jnp.sum(scene_valid), 1.0)
    noise_rms = jnp.sum(jnp.sqrt(variance) * scene_valid,
                        axis=(1, 2)) / n_valid                     # (C,)
    if wavelets_mode:
        detect, bulgelets, disklets = _wavelet_dictionaries(
            images, variance, scene_valid, n_scales, bulge_scales, dtype)
    else:
        detect = (jnp.sum(images / (noise_rms ** 2)[:, None, None], 0)
                  * scene_valid)                                   # (H,W)
    if stage == "coadd":
        return _probe(noise_rms, detect)

    # difference kernel (fft.match_psf semantics: k-space ratio at the
    # PSF-matching shape, kernel image at the PSF shape) and its rFFTs at
    # the fit shape — exactly what engine.make_blend_data precomputes
    kf = (fft_ops.transform(psfs, match_shape, (-2, -1))
          / fft_ops.transform(model_psf, match_shape, (-2, -1)))
    kimage = fft_ops.inverse_transform(kf, match_shape, psfs.shape, (-2, -1))
    kernel_rfft = fft_ops.transform(kimage, fft_shape, (-2, -1))
    grad_kernel_rfft = fft_ops.transform(kimage[..., ::-1, ::-1], fft_shape,
                                         (-2, -1))
    if stage == "kernels":
        return _probe(detect, kernel_rfft, grad_kernel_rfft)

    # detection image convolved to each band's seeing (for peak SEDs)
    convolved = fft_ops.convolve_fft(
        jnp.broadcast_to(detect, (C, H, W)), kernel_rfft, fft_shape, (-2, -1))

    # PSF SED: model PSF convolved per band, center pixel
    mh, mw = model_psf.shape[-2:]
    psf_krfft = fft_ops.transform(kimage, psf_fft_shape, (-2, -1))
    conv_psf = fft_ops.convolve_fft(
        jnp.broadcast_to(model_psf[0], (C, mh, mw)), psf_krfft,
        psf_fft_shape, (-2, -1))
    psf_sed = conv_psf[:, mh // 2, mw // 2]                        # (C,)

    # PSF morphology seed placed centered in the S x S box (static shapes:
    # center-crop when the PSF is larger than the box)
    py, px = psfs.shape[-2] // 2, psfs.shape[-1] // 2
    ch = min(mh, S)
    cw = min(mw, S)
    mp_crop = jax.lax.dynamic_slice(
        model_psf[0], ((mh - ch) // 2, (mw - cw) // 2), (ch, cw))
    oy, ox = (S - ch) // 2, (S - cw) // 2
    psf_morph = jnp.zeros((S, S), dtype).at[oy:oy + ch, ox:ox + cw].set(
        mp_crop / jnp.maximum(jnp.max(mp_crop), tiny))
    psf_box_mask = jnp.zeros((S, S), dtype).at[oy:oy + ch, ox:ox + cw].set(1.0)
    if stage == "convolved":
        return _probe(convolved, psf_sed, psf_morph)

    # --- padded views for dynamic box extraction --------------------------
    dpad = jnp.pad(detect, hS)
    vpad = jnp.pad(scene_valid, hS)
    ipad = jnp.pad(images, ((0, 0), (hS, hS), (hS, hS)))
    # PSF-shaped cutouts for the SNR measure
    ph, pw = psfs.shape[-2:]
    ipad_p = jnp.pad(images, ((0, 0), (py, py), (px, px)))
    vpad_p = jnp.pad(variance, ((0, 0), (py, py), (px, px)))

    z0 = jnp.asarray(0, jnp.int32)
    thresh_val = jnp.mean(noise_rms) * thresh
    flux_thresh = jnp.asarray(percentile / 100.0, dtype)
    yy, xx = jnp.mgrid[0:S, 0:S]
    ridx = jnp.arange(S)

    def center_snr(cy, cx):
        # SNR (lite/measure.py calculate_snr): PSF-weighted peak S/N
        img_c = jax.lax.dynamic_slice(ipad_p, (z0, cy, cx), (C, ph, pw))
        var_c = jax.lax.dynamic_slice(vpad_p, (z0, cy, cx), (C, ph, pw))
        return (jnp.sum(img_c * psfs)
                / jnp.sqrt(jnp.maximum(jnp.sum(psfs * var_c * psfs), tiny)))

    # --- joint bulge/disk SEDs (multifit_seds, closed-form 2x2) ----------
    def conv_box(mor, cy, cx):
        scene = jnp.zeros((H + 2 * hS, W + 2 * hS), dtype)
        scene = jax.lax.dynamic_update_slice(scene, mor, (cy, cx))
        scene = scene[hS:hS + H, hS:hS + W]
        conv = fft_ops.convolve_fft(
            jnp.broadcast_to(scene, (C, H, W)), kernel_rfft, fft_shape,
            (-2, -1))
        conv = jnp.pad(conv, ((0, 0), (hS, hS), (hS, hS)))
        return jax.lax.dynamic_slice(conv, (z0, cy, cx), (C, S, S))

    def fit_seds(bu, di, bm, cy, cx):
        A1 = conv_box(bu, cy, cx) * bm
        A2 = conv_box(di, cy, cx) * bm
        y = jax.lax.dynamic_slice(ipad, (z0, cy, cx), (C, S, S)) * bm
        g11 = jnp.sum(A1 * A1, axis=(1, 2))
        g22 = jnp.sum(A2 * A2, axis=(1, 2))
        g12 = jnp.sum(A1 * A2, axis=(1, 2))
        b1 = jnp.sum(A1 * y, axis=(1, 2))
        b2 = jnp.sum(A2 * y, axis=(1, 2))
        # relative ridge keeps the 2x2 solve finite when bulge == disk
        lam = 1e-6 * jnp.maximum(g11, g22) + tiny
        g11 = g11 + lam
        g22 = g22 + lam
        # all-zero morphs (null wavelet slots): tiny^2 underflows to 0 in
        # f32 and 0/0 would NaN — clamp; the numerators are 0 there too
        det = jnp.maximum(g11 * g22 - g12 * g12, tiny)
        sb = (g22 * b1 - g12 * b2) / det
        sd = (g11 * b2 - g12 * b1) / det
        return jnp.maximum(sb, 0.0), jnp.maximum(sd, 0.0)

    cys = centers[:, 0]
    cxs = centers[:, 1]

    if wavelets_mode:
        # --- wavelet recipe (ref lite/initialization.py:480-559) ----------
        bpad = jnp.pad(bulgelets, hS)
        kpad = jnp.pad(disklets, hS)

        def box_from_on(on):
            # project_morph_to_center box: centered quantized box covering
            # the mask bounds grown by ``grow`` (lite/utils.py:41-65; note
            # the stop-side +1 of the Box bound convention)
            row_on = jnp.any(on, axis=1)
            col_on = jnp.any(on, axis=0)
            y0 = jnp.min(jnp.where(row_on, ridx, S))
            y1 = jnp.max(jnp.where(row_on, ridx, -1))
            x0 = jnp.min(jnp.where(col_on, ridx, S))
            x1 = jnp.max(jnp.where(col_on, ridx, -1))
            reach = jnp.maximum(jnp.maximum(hS - y0, y1 + 1 - hS),
                                jnp.maximum(hS - x0, x1 + 1 - hS))
            size = 2 * (reach + grow)
            half = _quantized_boxsize(size, S) // 2
            return ((jnp.abs(yy - hS) <= half)
                    & (jnp.abs(xx - hS) <= half)).astype(dtype)

        def mask_morph(pad_img, cy, cx):
            dd = jax.lax.dynamic_slice(pad_img, (cy, cx), (S, S))
            on, m = prox_ops.monotonic_mask_device(dd, (hS, hS))
            no_support = (jnp.sum(on) <= 1) & (jnp.max(m) <= 0)
            bm = box_from_on(on)
            m = m * bm
            mx = jnp.max(m)
            return m / jnp.maximum(mx, tiny), bm, no_support | (mx <= 0)

        def per_center(cy, cx):
            snr = center_snr(cy, cx)
            nbr = jnp.floor(snr) / min_snr
            psf_gate = ((nbr < 1) & bool(use_psf)) | (detect[cy, cx] <= 0)
            morph1, bm1, no1 = mask_morph(dpad, cy, cx)
            morphB, bmB, noB = mask_morph(bpad, cy, cx)
            morphD, bmD, noD = mask_morph(kpad, cy, cx)
            want_split = (nbr >= 2) & ~psf_gate
            split = want_split & ~noB & ~noD
            # both bulge and disk empty -> null source; exactly one empty
            # -> degrade to the single-component path; single with no
            # support -> null (ref init_wavelet_source fallthrough)
            null_both = want_split & noB & noD
            single = (~psf_gate) & ~split & ~null_both
            null = null_both | (single & no1)

            img_pk = images[:, cy, cx]
            sed1 = ratio_sed(img_pk, convolved[:, cy, cx])
            sed_fb = ratio_sed(img_pk, psf_sed)
            return (morph1, sed1, sed_fb, bm1, morphB, bmB, morphD, bmD,
                    split, psf_gate, null, snr)

        (morph1, sed1, sed_fb, bm1, bulge, bmB, disk, bmD, split,
         psf_gate, null, snr) = jax.vmap(per_center)(cys, cxs)
        if stage == "percenter":
            return _probe(morph1, sed1, bulge, disk, snr)

        union_bm = jnp.maximum(bmB, bmD)
        bulge_sed, disk_sed = jax.vmap(fit_seds)(bulge, disk, union_bm,
                                                 cys, cxs)
        if stage == "seds":
            return _probe(morph1, sed1, bulge_sed, disk_sed)

        # components whose joint-SED solve is all-zero are dropped ("cut
        # bulge"/"cut disk", ref lite/initialization.py:371-381); both cut
        # -> null source
        bulge_cut = ~jnp.any(bulge_sed > 0, axis=1)
        disk_cut = ~jnp.any(disk_sed > 0, axis=1)

        sel3 = split[:, None, None]
        sel1 = split[:, None]
        gate3 = psf_gate[:, None, None]
        gate1 = psf_gate[:, None]
        prim_morph = jnp.where(gate3, psf_morph,
                               jnp.where(sel3, bulge, morph1))
        prim_sed = jnp.where(gate1, sed_fb,
                             jnp.where(sel1, bulge_sed, sed1))
        prim_mask = jnp.where(gate3, psf_box_mask,
                              jnp.where(sel3, bmB, bm1))
        disk_morph = disk
        disk_mask = bmD
        prim_on = center_on & ~null & ~(split & bulge_cut)
        disk_on = center_on & split & ~disk_cut
        split = split & ~bulge_cut & ~disk_cut
        fallback = psf_gate
    else:
        # --- main recipe (ref lite/initialization.py:321-419) -------------
        def per_center(cy, cx):
            snr = center_snr(cy, cx)
            split_snr = jnp.floor(snr) / min_snr >= 2

            # centered S x S detection cutout; SDSS symmetrization only
            # where both a pixel and its mirror are inside the image
            # (prox_uncentered_symmetry leaves the rest untouched)
            d = jax.lax.dynamic_slice(dpad, (cy, cx), (S, S))
            valid = jax.lax.dynamic_slice(vpad, (cy, cx), (S, S)) > 0.5
            both = valid & valid[::-1, ::-1]
            d = jnp.where(both, jnp.minimum(d, d[::-1, ::-1]), d)

            if use_mask:
                # monotonic reachability mask (prox_monotonic_mask
                # semantics: flood-fill closure, no threshold trim)
                on, m = prox_ops.monotonic_mask_device(d, (hS, hS))
                no_support = (jnp.sum(on) <= 1) & (jnp.max(m) <= 0)
            else:
                # exact weighted-monotonic projection about the center
                m = _mono_project(d, mono_w8, mono_keep, mono_iter)

                # threshold trim (initialization.trim_morphology): zero
                # sub-threshold pixels, centered quantized logical box
                m = jnp.where(m > thresh_val, m, jnp.asarray(0.0, dtype))
                on = m > 0
                no_support = jnp.asarray(False)
            row_on = jnp.any(on, axis=1)
            col_on = jnp.any(on, axis=0)
            y0 = jnp.min(jnp.where(row_on, ridx, S))
            y1 = jnp.max(jnp.where(row_on, ridx, -1))
            x0 = jnp.min(jnp.where(col_on, ridx, S))
            x1 = jnp.max(jnp.where(col_on, ridx, -1))
            contains = (y0 <= hS) & (hS <= y1) & (x0 <= hS) & (hS <= x1)
            # trim_morphology size: note the stop-side +1 of the Box bound
            # convention (initialization.py:150-157)
            size = 2 * jnp.maximum(
                jnp.maximum(hS - y0, y1 + 1 - hS),
                jnp.maximum(hS - x0, x1 + 1 - hS))
            if use_mask:
                # project_morph_to_center: center outside the support box
                # just falls to the minimum quantized box, never the PSF
                # fallback
                size = jnp.where(contains, size, 0)
            half = _quantized_boxsize(size, S) // 2
            box_mask = ((jnp.abs(yy - hS) <= half)
                        & (jnp.abs(xx - hS) <= half)).astype(dtype)
            m = m * box_mask

            morph_max = jnp.max(m)
            if use_mask:
                fallback = no_support | (morph_max <= 0)
            else:
                fallback = (~contains) | (morph_max <= 0)

            # peak SED from the image/convolved-detection ratio
            img_pk = images[:, cy, cx]
            sed = ratio_sed(img_pk, convolved[:, cy, cx]) * morph_max
            morph = m / jnp.maximum(morph_max, tiny)

            # PSF fallback
            sed_fb = ratio_sed(img_pk, psf_sed)
            morph = jnp.where(fallback, psf_morph, morph)
            sed = jnp.where(fallback, sed_fb, sed)
            box_mask = jnp.where(fallback, psf_box_mask, box_mask)

            # bulge/disk split candidates (percentile/100 flux threshold)
            disk = jnp.minimum(morph, flux_thresh)
            bulge = jnp.maximum(morph - flux_thresh, 0.0)
            bmax = jnp.max(bulge)
            dmax = jnp.max(disk)
            split = split_snr & (~fallback) & (bmax > 0) & (dmax > 0)
            bulge = bulge / jnp.maximum(bmax, tiny)
            disk = disk / jnp.maximum(dmax, tiny)
            return (morph, sed, box_mask, bulge, disk, split,
                    fallback, snr)

        (morph1, sed1, bmask, bulge, disk, split, fallback, snr) = jax.vmap(
            per_center)(cys, cxs)
        if stage == "percenter":
            return _probe(morph1, sed1, bmask, bulge, disk, snr)

        bulge_sed, disk_sed = jax.vmap(fit_seds)(bulge, disk, bmask,
                                                 cys, cxs)
        if stage == "seds":
            return _probe(morph1, sed1, bulge_sed, disk_sed)

        prim_morph = jnp.where(split[:, None, None], bulge, morph1)
        prim_sed = jnp.where(split[:, None], bulge_sed, sed1)
        prim_mask = bmask
        disk_morph = disk
        disk_mask = bmask
        prim_on = center_on
        disk_on = center_on & split

    # --- slot packing: (bulge|single, disk) interleaved, compacted -------
    K = centers.shape[0]
    origins_k = jnp.stack([cys - hS, cxs - hS], axis=-1).astype(jnp.int32)

    seds2 = jnp.stack([prim_sed, disk_sed], 1).reshape(2 * K, C)
    morphs2 = jnp.stack([prim_morph, disk_morph], 1).reshape(2 * K, S, S)
    bmask2 = jnp.stack([prim_mask, disk_mask], 1).reshape(2 * K, S, S)
    origins2 = jnp.stack([origins_k, origins_k], 1).reshape(2 * K, 2)
    active2 = jnp.stack([prim_on, disk_on], 1).reshape(2 * K)
    source2 = jnp.stack([jnp.arange(K), jnp.arange(K)], 1).reshape(2 * K)

    order = jnp.argsort(~active2, stable=True)[:n_slots]
    # zero INACTIVE slots' seds as well as morphs, with where (NOT a
    # multiply: NaN*0=NaN) — a non-finite value in a null slot would
    # otherwise ride into the scene assembly
    on_s = active2[order]
    seds_s = jnp.where(on_s[:, None], seds2[order], 0.0)
    morphs_s = jnp.where(on_s[:, None, None], morphs2[order], 0.0)
    bmask_s = bmask2[order]
    origins_s = origins2[order]
    active_s = active2[order]
    source_s = jnp.where(active_s, source2[order], -1)
    n_active = jnp.sum(active2.astype(jnp.int32))

    data_leaves = dict(
        kernel_rfft=jnp.stack(
            [jnp.real(kernel_rfft), jnp.imag(kernel_rfft)]),
        grad_kernel_rfft=jnp.stack(
            [jnp.real(grad_kernel_rfft), jnp.imag(grad_kernel_rfft)]),
        bg_rms=noise_rms,
        sed_step_min=noise_rms / 10.0,
        box_masks=bmask_s,
    )
    state_leaves = dict(
        seds=seds_s, morphs=morphs_s, origins=origins_s,
        comp_active=active_s,
    )
    aux = dict(n_active=n_active, overflow=n_active > n_slots,
               slot_source=source_s, snr=snr, split=split,
               psf_fallback=fallback)
    return data_leaves, state_leaves, aux


@partial(jax.jit, static_argnames=(
    "S", "n_slots", "fft_shape", "match_shape", "psf_fft_shape",
    "mono_iter", "min_snr", "thresh", "percentile", "use_mask",
    "recipe", "grow", "n_scales", "bulge_scales", "use_psf", "stage"))
def _stream_init_batch(images, variance, psfs, centers, center_on,
                       model_psf, scene_valid, mono_w8, mono_keep, *, S,
                       n_slots, fft_shape, match_shape, psf_fft_shape,
                       mono_iter, min_snr, thresh, percentile,
                       use_mask=False, recipe="main", grow=5, n_scales=5,
                       bulge_scales=2, use_psf=True, stage="full"):
    one = partial(
        _init_one_blend, S=S, n_slots=n_slots, fft_shape=fft_shape,
        match_shape=match_shape, psf_fft_shape=psf_fft_shape,
        mono_iter=mono_iter, min_snr=min_snr, thresh=thresh,
        percentile=percentile, use_mask=use_mask, recipe=recipe, grow=grow,
        n_scales=n_scales, bulge_scales=bulge_scales, use_psf=use_psf,
        stage=stage)
    return jax.vmap(
        lambda im, va, ps, ce, on, sv: one(im, va, ps, ce, on,
                                           model_psf, sv, mono_w8,
                                           mono_keep)
    )(images, variance, psfs, centers, center_on, scene_valid)


@partial(jax.jit, static_argnames=(
    "S", "n_slots", "fft_shape", "match_shape", "psf_fft_shape",
    "mono_iter", "min_snr", "thresh", "percentile", "use_mask", "recipe",
    "grow", "n_scales", "bulge_scales", "use_psf", "stage", "detect",
    "max_peaks", "detect_scales", "box_grow_on"))
def _stream_setup_program(images, variance, psfs, centers, center_active,
                          scene_valid, weights, model_psf, w8, keep_c,
                          fit_mono_w, fit_mono_keep, *, S, n_slots,
                          fft_shape, match_shape, psf_fft_shape, mono_iter,
                          min_snr, thresh, percentile, use_mask, recipe,
                          grow, n_scales, bulge_scales, use_psf, stage,
                          detect, max_peaks, detect_scales, box_grow_on):
    """The ENTIRE device side of stream_setup as ONE compiled program:
    sanitization, default weights, (optional) device detection, catalog
    masking, the batched init, and the BlendData/BlendState assembly.

    Why one program: the stream's init cost is DISPATCH-bound, not
    compute-bound, on a tunneled TPU.  The r4 het phase profile charged
    21% of het wall to "stream_setup" (0.138 s/chunk), but the truncation
    profile (tools/init_phase_profile.py, r5) measured the init program's
    pure device compute at ~12 ms/chunk — the rest was ~35 eager op
    dispatches (sanitize, weights, catalog masking, optimizer-state
    zeros), each paying a tunnel round trip that inflates 10-30x in bad
    weather.  Fusing everything into one jit makes setup cost one
    dispatch regardless of link health.
    """
    B, C, H, W = images.shape
    dtype = images.dtype
    has_valid = scene_valid is not None
    if scene_valid is None:
        scene_valid = jnp.ones((B, H, W), dtype)
    else:
        scene_valid = scene_valid.astype(dtype)
    # Sanitize non-finite pixels (masked regions in real survey cutouts
    # arrive as NaN/inf): a NaN data pixel poisons the whole fit even at
    # weight 0 (0*NaN = NaN in the gradient), so bad pixels are zeroed,
    # excluded from the weights, and given the per-band mean finite
    # variance so the init-time noise estimates stay unbiased.  All of
    # this is bitwise inert for finite inputs.
    # negative variance is corrupt input too: sqrt(variance) in the init
    # noise estimates would turn it into NaN (variance 0 stays legal —
    # it is the heterogeneous-crop padding convention)
    images, variance, bad = _sanitize_stacks(images, variance)
    if weights is None:
        # padding pixels of zero-padded heterogeneous crops have
        # variance 0: without the scene_valid factor they would get
        # weight 1e12 and the convolved model's leak past the true scene
        # edge would dominate every gradient
        weights = (scene_valid[:, None] * jnp.where(bad, 0.0, 1.0)
                   / jnp.maximum(variance, 1e-12))
    else:
        weights = jnp.where(bad | ~jnp.isfinite(weights), 0.0, weights)

    detected_peaks = None
    if detect:
        # device-side catalogs: the host starlet-footprint peak recipe
        # (ref detect.py:517-572) on the sanitized stacks
        from .detection import detect_peaks_device

        centers, center_active, detected_peaks = detect_peaks_device(
            images, variance, scene_valid if has_valid else None,
            max_peaks=int(max_peaks), scales=int(detect_scales))
    else:
        if jnp.issubdtype(centers.dtype, jnp.floating):
            centers = jnp.round(centers).astype(jnp.int32)
        else:
            centers = centers.astype(jnp.int32)
        if center_active is None:
            center_active = jnp.ones(centers.shape[:2], bool)
    # Out-of-frame catalog rows (common when detections come from a larger
    # field) and rows landing in the zero padding of heterogeneous crops
    # would otherwise seed clamped edge sources that wreck the fit;
    # deactivate them exactly like the host recipe's skip list
    # (ref initialization.py:287-363 silently skips failed centers).
    in_bounds = ((centers[..., 0] >= 0) & (centers[..., 0] < H)
                 & (centers[..., 1] >= 0) & (centers[..., 1] < W))
    cy = jnp.clip(centers[..., 0], 0, H - 1)
    cx = jnp.clip(centers[..., 1], 0, W - 1)
    on_valid = scene_valid[jnp.arange(B)[:, None], cy, cx] > 0
    center_active = center_active & in_bounds & on_valid

    data_l, state_l, aux = _stream_init_batch(
        images, variance, psfs, centers, center_active, model_psf,
        scene_valid, w8, keep_c, S=S, n_slots=n_slots,
        fft_shape=fft_shape, match_shape=match_shape,
        psf_fft_shape=psf_fft_shape, mono_iter=mono_iter, min_snr=min_snr,
        thresh=thresh, percentile=percentile, use_mask=use_mask,
        recipe=recipe, grow=grow, n_scales=n_scales,
        bulge_scales=bulge_scales, use_psf=use_psf, stage=stage)
    if stage != "full":
        # phase-profiling truncation (tools/init_phase_profile.py): the
        # probe scalar keeps every computed stage live through XLA DCE
        return data_l, state_l, aux
    if detected_peaks is not None:
        aux = dict(aux, detected_peaks=detected_peaks, centers=centers,
                   center_active=center_active)

    data = engine.BlendData(
        images=images,
        weights=weights,
        kernel_rfft=data_l["kernel_rfft"],
        grad_kernel_rfft=data_l["grad_kernel_rfft"],
        bg_rms=data_l["bg_rms"],
        sed_step_min=data_l["sed_step_min"],
        mono_weights=(fit_mono_w.astype(dtype),),
        mono_keep=(fit_mono_keep.astype(dtype),),
        box_masks=(data_l["box_masks"],),
        scene_mask=scene_valid if has_valid else None,
    )
    zero_sed = jnp.zeros_like(state_l["seds"])
    zero_mor = jnp.zeros_like(state_l["morphs"])
    state = engine.BlendState(
        seds=(state_l["seds"],),
        morphs=(state_l["morphs"],),
        origins=(state_l["origins"],),
        comp_active=(state_l["comp_active"],),
        sed_opt=(AdaproxState(m=zero_sed, v=zero_sed, vhat=zero_sed),),
        morph_opt=(AdaproxState(m=zero_mor, v=zero_mor, vhat=zero_mor),),
        active=jnp.ones((B,), bool),
        it=jnp.zeros((B,), jnp.int32),
        last_loss=jnp.full((B,), jnp.inf, dtype),
        # box-growth state (config.box_grow): -1 = still the init box
        box_half=None if not box_grow_on else (
            jnp.full((B, n_slots), -1, jnp.int32),),
        step_scale=None if not box_grow_on else (
            jnp.ones((B, n_slots), dtype),),
    )
    return data, state, aux


def stream_setup(images, variance, psfs, centers, model_psf,
                 weights=None, center_active=None, scene_valid=None, *,
                 box_size, n_slots, min_snr=50, thresh=0.5, percentile=25,
                 bg_thresh=None, e_rel=1e-4, min_iter=1, fft_shape=None,
                 platform=None, use_mask=False, recipe="main", grow=5,
                 wavelet_scales=5, bulge_scales=2, use_psf=True,
                 max_peaks=None, detect_scales=3, box_grow=None,
                 mono_tol=None, mono_tol_early=0.0, mono_tol_switch=0,
                 mono_every=1, morph_step=None, min_gradient=0.0,
                 _stage="full"):
    """Batched device-side initialization of a stream of blends.

    Parameters
    ----------
    images, variance : (B, C, H, W) float32 stacks.
    psfs : (B, C, ph, pw) per-band observed PSFs.
    centers : (B, K, 2) integer (y, x) peak positions; pad unused rows
        anywhere in-image and mark them in ``center_active``.  Rows
        outside the frame (or on zero pixels of ``scene_valid``) are
        deactivated automatically — the device analog of the host
        recipe's skip list.  Pass ``None`` to detect peaks ON DEVICE
        (``parallel.detect_peaks_device``: the host's starlet-footprint
        catalog recipe, ref detect.py:517-572, as one vmapped XLA
        program) — the stream then runs raw pixels -> catalog -> fluxes
        with zero per-blend host work; ``max_peaks`` (default
        ``n_slots``) sets the catalog slot count and ``detect_scales``
        the starlet depth, and ``aux["detected_peaks"]`` reports the
        pre-cut per-blend peak counts.
    model_psf : (1, mh, mw) target (model-frame) PSF.
    weights : optional (B, C, H, W); default
        scene_valid/max(variance, 1e-12) — padding pixels get weight 0
        automatically.  Non-finite data/variance pixels are always
        zeroed out of both the images and the weights (masked-pixel
        sanitization; NaNs would otherwise poison the fit at any
        weight).
    center_active : optional (B, K) bool; default all on.
    scene_valid : optional (B, H, W) mask of real pixels, for streams of
        heterogeneous crops zero-padded to one (H, W): pad images/variance
        with 0 and mark padding 0 here so the detection coadd, noise RMS,
        symmetrization, and the default weights see only real pixels
        (explicitly passed weights must be 0 on padding themselves).
        Default all-ones (homogeneous stream).
    box_size : physical component box S (odd).  Static.
    n_slots : component slots per blend (>= max expected components; a
        blend needing more sets ``aux["overflow"]``).  Static.
    recipe : "main" (chi^2-coadd, SDSS-symmetrized monotonic seeds — ref
        lite/initialization.py:321-419) or "wavelets" (starlet detection
        dictionaries with multiresolution support; bulge from
        scales[:bulge_scales], disk from scales[bulge_scales:-1], boxes
        grown by ``grow`` — ref lite/initialization.py:422-605).  For
        heterogeneous zero-padded streams the wavelet scale cap uses the
        shared physical (H, W) rather than each blend's natural crop.
    grow, wavelet_scales, bulge_scales, use_psf : wavelet-recipe knobs
        (ref lite/initialization.py:289-291, 385-389).

    Returns (config, data, state, aux): batched BlendData/BlendState ready
    for ``fit_batch``/``fit_batch_device_converged`` at the same layout
    `pack_blends` produces, plus per-blend diagnostics (``n_active``,
    ``overflow``, ``slot_source``, ``snr``, ``split``, ``psf_fallback``).
    """
    B, C, H, W = np.shape(images)
    S = int(box_size)
    if S % 2 == 0:
        raise ValueError(f"box_size must be odd, got {S}")
    if recipe not in ("main", "wavelets"):
        raise ValueError(f"unknown recipe {recipe!r}")
    detect = centers is None
    if detect and center_active is not None:
        raise ValueError(
            "center_active only applies to a provided catalog; "
            "with centers=None the detector defines the active rows")
    if not detect and not isinstance(centers, jnp.ndarray):
        # host catalogs round on host (device ones round inside the
        # program — never ship a device array back just to round it)
        centers = np.round(np.asarray(centers)).astype(np.int32)

    if fft_shape is None:
        fft_shape = fft_ops.minimal_same_fft_shape(
            (C, H, W), np.shape(psfs)[1:], axes=(1, 2))
    match_shape = tuple(fft_ops.good_fft_shape(
        np.shape(psfs)[1:], np.shape(model_psf), padding=3, axes=(-2, -1)))
    psf_fft_shape = tuple(fft_ops.good_fft_shape(
        np.shape(model_psf), np.shape(psfs)[1:], padding=3, axes=(-2, -1)))

    dtype = np.dtype(getattr(images, "dtype", np.float32))
    w8, keep_c, depth = _centered_mono_table(S, dtype)

    # scale count capped by the PHYSICAL (H, W) exactly like the host caps
    # by its natural image shape (wavelet.get_scales)
    from ..ops.wavelet import get_scales

    n_scales = get_scales((H, W), int(wavelet_scales))

    mono_w, mono_keep, fit_depth = engine.monotonicity_tables(
        (S, S), 1, "angle")

    out = _stream_setup_program(
        images, variance, psfs, centers, center_active, scene_valid,
        weights, model_psf, w8, keep_c, mono_w.astype(dtype),
        mono_keep.astype(dtype), S=S, n_slots=int(n_slots),
        fft_shape=tuple(fft_shape), match_shape=match_shape,
        psf_fft_shape=psf_fft_shape, mono_iter=depth,
        min_snr=float(min_snr), thresh=float(thresh),
        percentile=float(percentile), use_mask=bool(use_mask),
        recipe=str(recipe), grow=int(grow), n_scales=int(n_scales),
        bulge_scales=int(bulge_scales), use_psf=bool(use_psf),
        stage=str(_stage), detect=bool(detect),
        max_peaks=int(n_slots if max_peaks is None else max_peaks),
        detect_scales=int(detect_scales),
        box_grow_on=box_grow is not None)
    if _stage != "full":
        return out
    data, state, aux = out

    if platform is None:
        platform = jax.devices()[0].platform
    config = engine.LiteFitConfig(
        scene_shape=(C, H, W),
        box_shapes=((S, S),),
        bucket_counts=(int(n_slots),),
        fft_shape=tuple(fft_shape),
        mono_n_iters=(int(fit_depth),),
        bg_thresh=bg_thresh,
        e_rel=float(e_rel),
        min_iter=int(min_iter),
        fit_center_radius=1,
        box_grow=None if box_grow is None else float(box_grow),
        # accelerator default 1e-3: the mono kernel exits its Jacobi sweep
        # at max|delta| < 1e-3 (peak units) instead of the bitwise fixed
        # point — +17% steady-state with final records BITWISE IDENTICAL
        # on the replicated hsc_cosmos_35 fit AND all 256 heterogeneous
        # A/B blends (the outer adaprox loop re-projects every iteration,
        # correcting the truncated tail; BASELINE r4).  1e-2 measured
        # unsafe (worst -442 logL) — never default.  0.0 = exact
        # reference-parity projection (the CPU/test default).
        mono_tol=(1e-3 if platform != "cpu" else 0.0)
        if mono_tol is None else float(mono_tol),
        # iteration-scheduled tolerance (looser mono_tol_early before
        # iteration mono_tol_switch, mono_tol after; one compiled
        # program — the tolerance is a traced SMEM scalar).  0/0 = off.
        mono_tol_early=float(mono_tol_early),
        mono_tol_switch=int(mono_tol_switch),
        # full projection every N-th iteration only (skip iterations run
        # one 4-pass block via a huge traced tol); MEASURED NEGATIVE —
        # the fit zigzags and converges far slower (BASELINE r4); keep 1
        mono_every=int(mono_every),
        # morphology step size (engine default 1e-2); exposed for the
        # wavelet-recipe convergence A/B (tools/wavelet_step_ab.py) —
        # the diffuse starlet-initialized models are the slow convergers
        morph_step=1e-2 if morph_step is None else float(morph_step),
        # fit-time monotonicity decline (ref ExtendedSource min_grad,
        # source.py: steeper-than-flat radial profiles); the INIT
        # projection stays min_gradient=0 like the reference's init.
        # Candidate knob for the crowded-field rms size bias
        # (tools/size_bias_mingrad_ab.py)
        min_gradient=float(min_gradient),
        use_pallas=platform != "cpu",
        use_pallas_scene=platform != "cpu",
        conv_mode="dft" if platform != "cpu" else "fft",
        scene_pad=S // 2 + 2,
        packed_morphs=platform != "cpu",
    )
    return config, data, state, aux


@jax.jit
def _stream_records_device(state, aux):
    """Per-source model fluxes (B, K, C) and intensity-weighted centroids
    (B, K, 2) in scene coordinates.

    The centroid is exact: for the factorized model the channel-summed
    per-source image is sum_s (sum_c sed_sc) morph_s, so its centroid is
    the slot centroids weighted by slot total flux — identical to
    measure.centroid (ref scarlet/measure.py:40-57) on the assembled
    per-source model, with no scene render."""
    seds = state.seds[0]                    # (B, n_slots, C)
    morphs = state.morphs[0]                # (B, n_slots, hb, wb)
    on = state.comp_active[0]               # (B, n_slots)
    origins = state.origins[0]              # (B, n_slots, 2)
    msum = jnp.sum(morphs, axis=(-2, -1))   # (B, n_slots)
    flux = seds * msum[..., None] * on[..., None]
    K = aux["snr"].shape[1]
    src = jnp.where(on, aux["slot_source"], K)   # (B, n_slots)

    def seg(f, s):
        return jax.ops.segment_sum(f, s, num_segments=K + 1)[:K]

    vseg = jax.vmap(seg)
    per_source = vseg(flux, src)             # (B, K, C)

    iy = jnp.arange(morphs.shape[-2], dtype=morphs.dtype)
    ix = jnp.arange(morphs.shape[-1], dtype=morphs.dtype)
    denom = jnp.where(msum != 0, msum, 1.0)
    # measurement contractions pinned to the f32-equivalent matmul tier:
    # astrometry/shape records must not pick up 1-pass-bf16 drift when
    # XLA routes these through the MXU (TPU DEFAULT tier; the CPU suite
    # runs exact f32 and cannot catch it)
    ein = lambda s, *ops: jnp.einsum(s, *ops, precision="float32")  # noqa
    cy = ein("bkyx,y->bk", morphs, iy) / denom \
        + origins[..., 0].astype(morphs.dtype)
    cx = ein("bkyx,x->bk", morphs, ix) / denom \
        + origins[..., 1].astype(morphs.dtype)
    wslot = jnp.sum(flux, axis=-1)           # (B, n_slots) total slot flux
    wsum = vseg(wslot[..., None], src)[..., 0]            # (B, K)
    wsafe = jnp.where(wsum != 0, wsum, 1.0)
    cen_y = vseg((wslot * cy)[..., None], src)[..., 0] / wsafe
    cen_x = vseg((wslot * cx)[..., None], src)[..., 0] / wsafe
    centroid = jnp.stack([cen_y, cen_x], axis=-1)         # (B, K, 2)
    # a source with no active slots (slot overflow, zero flux) has no
    # centroid — NaN, not (0, 0), so consumers (pos-diff metric, CLI)
    # can tell "unmeasured" from "at the origin"
    centroid = jnp.where(wsum[..., None] != 0, centroid, jnp.nan)

    # per-source flux-normalized CENTRAL second moments of the
    # channel-summed model (sigma_yy, sigma_xx, sigma_xy) — same closed
    # form as the centroid: per-slot raw global moments, segment-summed,
    # centralized about the source centroid.  These are the physically
    # conventional moments (the reference's measure.moments mirrors a
    # grid_x/grid_y axis mix-up from np.indices — ref measure.py:135-141
    # — which this deliberately does not reproduce; shape measures here
    # feed ellipticities, not a parity surface).
    sedsum = jnp.where(msum != 0, wslot / jnp.where(msum != 0, msum, 1.0),
                       0.0)                  # (B, n_slots) channel-sum sed
    oy = origins[..., 0].astype(morphs.dtype)
    ox = origins[..., 1].astype(morphs.dtype)
    m1y = ein("bkyx,y->bk", morphs, iy)
    m1x = ein("bkyx,x->bk", morphs, ix)
    m2y = ein("bkyx,y->bk", morphs, iy * iy)
    m2x = ein("bkyx,x->bk", morphs, ix * ix)
    mxy = ein("bkyx,y,x->bk", morphs, iy, ix)
    # centralize each slot about its SOURCE's (already computed)
    # centroid before squaring: |origin - centroid| is O(box), not
    # O(scene), so the f32 raw-minus-center^2 cancellation never sees
    # coordinate-squared magnitudes (on a 300-px scene the naive global
    # form loses 10-100% of a compact source's sigma to roundoff)
    src_c = jnp.minimum(src, K - 1)
    ceny_s = jnp.take_along_axis(cen_y, src_c, axis=1)
    cenx_s = jnp.take_along_axis(cen_x, src_c, axis=1)
    # zero-flux sources have NaN centroids; their slots carry no weight
    ceny_s = jnp.where(jnp.isfinite(ceny_s), ceny_s, 0.0)
    cenx_s = jnp.where(jnp.isfinite(cenx_s), cenx_s, 0.0)
    dy0 = oy - ceny_s
    dx0 = ox - cenx_s
    cy2 = m2y + 2 * dy0 * m1y + dy0 * dy0 * msum  # sum morph (y-cen_y)^2
    cx2 = m2x + 2 * dx0 * m1x + dx0 * dx0 * msum
    cxy = mxy + dy0 * m1x + dx0 * m1y + dy0 * dx0 * msum
    myy = vseg((sedsum * cy2)[..., None], src)[..., 0] / wsafe
    mxx = vseg((sedsum * cx2)[..., None], src)[..., 0] / wsafe
    mxy_c = vseg((sedsum * cxy)[..., None], src)[..., 0] / wsafe
    moments2 = jnp.stack([myy, mxx, mxy_c], axis=-1)      # (B, K, 3)
    moments2 = jnp.where(wsum[..., None] != 0, moments2, jnp.nan)
    return per_source, centroid, moments2


@partial(jax.jit, static_argnames=("config",))
def _stream_weighted_flux(state, data, aux, config):
    """Device flux reweighting (lite/measure.py weight_sources semantics):
    redistribute the OBSERVED flux among sources by the ratio of each
    source's convolved model to the total convolved model, capped at 1.

    Per-band per-source totals, (B, K, C).  One scene render + K per-source
    renders per blend — all batched."""
    from .batch import _data_in_axes

    K = aux["snr"].shape[1]

    def one(state_b, data_b, slot_source):
        total = engine.render(state_b, data_b, config)
        total = jnp.maximum(total, 0.0)
        imgs = data_b.images * (data_b.weights > 0)

        def per_source(s):
            on_s = state_b.comp_active[0] & (slot_source == s)
            st = state_b._replace(comp_active=(on_s,))
            conv_s = jnp.maximum(engine.render(st, data_b, config), 0.0)
            ratio = jnp.where(total > 0, conv_s / jnp.where(total > 0, total,
                                                            1.0), 0.0)
            ratio = jnp.minimum(ratio, 1.0)
            return jnp.sum(ratio * imgs, axis=(-2, -1))   # (C,)

        return jax.lax.map(per_source, jnp.arange(K))     # (K, C)

    return jax.vmap(
        one, in_axes=(0, _data_in_axes(data), 0))(state, data,
                                                  aux["slot_source"])


def stream_records(state, losses, aux, data=None, config=None,
                   reweight=False):
    """Per-blend measurement records from a fitted stream batch (host dicts;
    the reductions run on device).

    With ``reweight=True`` (requires ``data`` and ``config``), per-source
    fluxes use the observed-flux redistribution of
    ``lite.measure.weight_sources`` instead of raw model sums."""
    per_source, centroids, moments2 = _stream_records_device(state, aux)
    if reweight:
        if data is None or config is None:
            raise ValueError("reweight=True needs data and config")
        per_source = _stream_weighted_flux(state, data, aux, config)
    # ONE fused device->host fetch: device_get starts async copies for
    # every leaf before blocking, so the transfers' tunnel round trips
    # overlap instead of paying a synchronous RTT per np.asarray (8 of
    # them measured ~0.09 s/chunk = 10% of het stream wall, BASELINE r4).
    (per_source, centroids, moments2, its, last, comp_on, snr_init,
     overflowed, losses) = jax.device_get(
        (per_source, centroids, moments2, state.it, state.last_loss,
         state.comp_active[0], aux["snr"], aux["overflow"], losses))
    # physical active slots (aux["n_active"] counts desired components,
    # which exceeds this when a blend overflows n_slots)
    n_act = comp_on.sum(axis=1)
    overflowed = np.asarray(overflowed).reshape(-1)
    losses = np.asarray(losses)
    records = []
    for b in range(per_source.shape[0]):
        records.append({
            "iterations": int(its[b]),
            "logL": float(last[b]),
            "init logL": float(losses[0, b]) if losses.size else float("nan"),
            "n_components": int(n_act[b]),
            # init wanted more components than the slot layout holds
            # (sources dropped unless the overflow-retry lane re-fit it)
            "overflow": bool(overflowed[b]),
            "flux": per_source[b],
            "centroid": centroids[b],
            # flux-normalized central 2nd moments (sigma_yy, sigma_xx,
            # sigma_xy) of the channel-summed model — sizes and
            # ellipticities (e1 = (sxx-syy)/(sxx+syy), e2 = 2 sxy/tr)
            "moments": moments2[b],
            # PSF-weighted detection SNR per source from the device init
            # (ref scarlet/lite/measure.py calculate_snr) — the quantity
            # the init's bulge/disk split gates on
            "snr": snr_init[b],
        })
    return records


def deblend_device_stream(images, variance, psfs, centers, model_psf,
                          weights=None, center_active=None,
                          scene_valid=None, *, box_size,
                          n_slots, max_iter=100, check_every=25,
                          min_snr=50, e_rel=1e-4, reweight=False,
                          chunk=None, compact=None, upload_dtype=None,
                          upload="bulk", upload_bw_mbs=100.0,
                          redetect=0, redetect_radius=3.0,
                          retry_overflow=False,
                          **kw):
    """One-call production path: device init + device fit + records.

    The entire stream batch runs as three compiled programs with no
    per-blend host work.  ``reweight=True`` reports observed-flux
    redistribution (weight_sources) instead of raw model fluxes.
    ``centers=None`` detects the catalogs on device too (per chunk, so
    detection pipelines with the fits like the init does — see
    ``stream_setup``/``parallel.detect_peaks_device``); pass
    ``max_peaks=``/``detect_scales=`` through to size it.

    ``chunk`` splits the stream into sub-batches whose fits are dispatched
    asynchronously before any result is collected, so the init of chunk
    ``i+1`` overlaps the fit of chunk ``i``.

    The raw pixel stacks are bulk-uploaded in ONE async transfer up front
    and sliced on device per chunk: piecemeal host->device transfers that
    land while a fit program is executing crawl at ~1-5% of idle-device
    bandwidth on a tunneled TPU (measured: 17 vs 680 MB/s), which costs
    ~35% of end-to-end throughput if the upload is interleaved per chunk.

    ``upload`` picks the transfer strategy for host-resident stacks:
    ``"bulk"`` (default, above), ``"overlap"`` (per-chunk double-buffered
    device_put — chunk ``i+1``'s transfer is in flight while chunk ``i``
    fits; wins when the LINK is the bottleneck: the r4 driver capture
    paid a 4.4 s bulk upload strictly ahead of 1.3 s of compute), or
    ``"auto"`` (one 4 MB idle-bandwidth probe, then overlap below
    ``upload_bw_mbs`` MB/s and bulk above).  Device-resident inputs and
    single-chunk calls ignore it.

    ``upload_dtype`` (e.g. ``jnp.bfloat16``) quantizes the raw host
    stacks (images/variance/psfs/weights/masks) to that dtype for the
    host->device transfer only — they are cast back to float32 on device
    per chunk, so every compute program stays f32-exact and only the
    input data is quantized once (~0.4% per-value for bf16).  Halves the
    bytes through a slow link, but measured only ~1.02x end-to-end in a
    healthy tunnel window, and the quantization can flip DISCRETE init
    decisions (SNR gates, box sizes, bulge/disk splits) on marginal
    sources, occasionally changing a fit substantially (generated het
    set: flux deviation median 1.5% but p95 10%; one blend's logL moved
    by 4196 — BASELINE r3 finding 10).  Leave ``None`` (default) for
    bit-exact inputs; reach for this only when the link is the proven
    bottleneck and per-blend reproducibility doesn't matter.
    Device-resident inputs are never touched.

    ``compact`` (an iteration count or an ascending list of them, ideally
    ``check_every`` multiples) turns on convergence compaction: chunks
    run to the first point, then ONLY the still-unconverged blends —
    gathered across all chunks into one small padded residual batch —
    continue, re-compacting at each further point until ``max_iter``.
    Converged blends freeze but still cost compute inside a batch, so
    without compaction a single straggler forces its whole chunk to the
    cap; with it each tail segment is paid only by the blends still
    running.  Worthwhile when most blends converge early (e.g. the
    generated regression sets: median 28 its).

    ``redetect=N`` runs N extra detect-on-residuals passes (the
    production form of the quickstart's manual residual-peak source
    addition): after each fit, the batched model renders subtract from
    the data, `detect_peaks_device` runs on the residual stack, peaks
    farther than ``redetect_radius`` px from the current catalog join
    it (truncated to ``max_peaks``), and the stream re-initializes and
    refits (cold, full budget) with the grown catalog.  Measured on the
    very crowded generated set: one pass lifts detection completeness
    65.8% -> 71.2% (false rate 0.5% -> 2.8%) for ~2x fit cost, with
    per-blend logL improving at a sufficient iteration budget.  Keep
    ``redetect_radius`` >= ~the PSF width: 2 px admits near-duplicate
    peaks that split real sources and regress the fit (measured; 3 px
    keeps the full completeness gain without it).  Works with an
    explicit catalog or ``centers=None``.

    ``retry_overflow=True`` closes the slot-overflow source drops: blends
    whose init wanted more components than ``n_slots`` (``aux["overflow"]``
    — the reference's init keeps EVERY detected peak, degrading only on
    failure, ref initialization.py:287-363) are re-initialized and refit
    as one small padded batch at a larger slot count (quantized in steps
    of 4 so retries reuse a handful of compiled programs).  Their records
    are replaced in place (flagged ``overflow_retried``) and the retry
    pass's state/losses/aux append as one extra chunk entry whose aux
    carries ``retry_indices`` (positions in the stream order) — so when
    any blend overflowed, state/losses/aux are per-chunk lists even for
    an unchunked call.

    Returns (records, state, losses, aux); with ``chunk`` set (and no
    ``compact``), state/losses/aux are per-chunk lists; with ``compact``
    they are merged across chunks."""
    from .batch import (fit_batch_device_dispatch,
                        fit_batch_device_collect)

    if redetect:
        return _deblend_redetect(
            images, variance, psfs, centers, model_psf, weights,
            center_active, scene_valid, box_size=box_size,
            n_slots=n_slots, max_iter=max_iter, check_every=check_every,
            min_snr=min_snr, e_rel=e_rel, reweight=reweight, chunk=chunk,
            compact=compact, upload_dtype=upload_dtype,
            redetect=int(redetect), redetect_radius=float(redetect_radius),
            retry_overflow=retry_overflow,
            **kw)

    qdtype = None if upload_dtype is None else jnp.dtype(upload_dtype)

    def put(x):
        if x is None or isinstance(x, jnp.ndarray):
            return x
        x = np.ascontiguousarray(x)
        if qdtype is not None and np.issubdtype(x.dtype, np.floating):
            x = x.astype(qdtype)
        return jax.device_put(x)

    B = np.shape(images)[0]
    if chunk is None or chunk >= B:
        spans = [slice(0, B)]
    else:
        spans = [slice(i, min(i + chunk, B)) for i in range(0, B, chunk)]

    # upload strategy for host-resident stacks ("bulk"/"overlap"/"auto"):
    # bulk = ONE async transfer up front (default: interleaved transfers
    # that land while a fit executes crawl at ~1-5% of idle bandwidth on
    # a HEALTHY tunnel, BASELINE r3 finding 1-2); overlap = per-chunk
    # double-buffered device_put, chunk i+1's transfer in flight while
    # chunk i fits (wins when the LINK is the bottleneck: r4 capture had
    # a 4.4 s bulk upload strictly ahead of 1.3 s of compute); auto =
    # probe the idle link once and pick (threshold ``upload_bw_mbs``).
    if upload not in ("bulk", "overlap", "auto"):
        raise ValueError(f"unknown upload mode {upload!r}")
    mode = upload
    if isinstance(images, jnp.ndarray) or len(spans) == 1:
        mode = "bulk"
    elif mode == "auto":
        bw = _upload_bandwidth_mbs()
        mode = "overlap" if bw < float(upload_bw_mbs) else "bulk"
        logger.info("deblend_device_stream: measured %.1f MB/s idle "
                    "upload -> %s uploads", bw, mode)

    if mode == "bulk":
        images = put(images)
        variance = put(variance)
        psfs = put(psfs)
        weights = put(weights)
        scene_valid = put(scene_valid)

    def sub(x, sl):
        if x is None:
            return None
        y = x[sl]
        # cast quantized uploads back to f32 on device, per chunk, so the
        # cast overlaps the previous chunk's fit and compute stays f32
        if qdtype is not None and y.dtype == qdtype:
            y = y.astype(jnp.float32)
        return y

    def sub_up(x, sl):
        # overlap mode: slice on host, launch the (async) transfer now —
        # it proceeds while the previous chunk's fit program executes
        if x is None:
            return None
        d = put(np.asarray(x)[sl])
        if qdtype is not None and d.dtype == qdtype:
            d = d.astype(jnp.float32)
        return d

    def chunk_args(sl):
        get = sub if mode == "bulk" else sub_up
        return (get(images, sl), get(variance, sl), get(psfs, sl),
                sub(centers, sl), get(weights, sl),
                sub(center_active, sl), get(scene_valid, sl))

    if compact is None:
        points = ()
    elif np.isscalar(compact):
        points = (min(int(compact), max_iter),)
    else:
        points = tuple(sorted({min(int(c), max_iter) for c in compact}))
    if any(c <= 0 for c in points):
        raise ValueError(f"compact points must be positive, got {compact}")
    phase1 = points[0] if points else max_iter
    handles = []
    pre = chunk_args(spans[0])
    for i in range(len(spans)):
        c_im, c_var, c_psf, c_cen, c_w, c_ca, c_sv = pre
        config, data, state, aux = stream_setup(
            c_im, c_var, c_psf, c_cen, model_psf, weights=c_w,
            center_active=c_ca, scene_valid=c_sv, box_size=box_size,
            n_slots=n_slots, min_snr=min_snr, e_rel=e_rel, **kw)
        handle = fit_batch_device_dispatch(
            state, data, config, phase1, check_every=check_every)
        if i + 1 < len(spans):
            pre = chunk_args(spans[i + 1])
        handles.append((handle, data, config, aux))

    if points and phase1 < max_iter:
        result = _collect_compacted(handles, points, max_iter, check_every,
                                    reweight)
    else:
        records, outs, losses_l, auxs = [], [], [], []
        for handle, data, config, aux in handles:
            out, losses = fit_batch_device_collect(handle, max_iter)
            records.extend(stream_records(out, losses, aux, data=data,
                                          config=config, reweight=reweight))
            outs.append(out)
            losses_l.append(losses)
            auxs.append(aux)
        if len(spans) == 1:
            result = records, outs[0], losses_l[0], auxs[0]
        else:
            result = records, outs, losses_l, auxs

    if retry_overflow:
        result = _retry_overflow(
            result, images, variance, psfs, centers, model_psf, weights,
            center_active, scene_valid, box_size=box_size,
            n_slots=n_slots, max_iter=max_iter, check_every=check_every,
            min_snr=min_snr, e_rel=e_rel, reweight=reweight, kw=kw)
    return result


def _retry_overflow(result, images, variance, psfs, centers, model_psf,
                    weights, center_active, scene_valid, *, box_size,
                    n_slots, max_iter, check_every, min_snr, e_rel,
                    reweight, kw):
    """Re-run the slot-overflowed blends at a larger slot count.

    The reference's init never drops a detected peak (degrading K only on
    per-source failure, ref initialization.py:287-363, 481-488); a fixed
    ``n_slots`` layout does, silently, for the ``aux["overflow"]`` blends.
    This lane re-initializes and refits exactly that subset — padded to a
    16-row bucket with all-inactive catalog rows (they converge in ~2
    iterations) and at a slot count quantized upward in steps of 4, so
    the retries of a whole survey stream reuse a handful of compiled
    programs — and splices the records back in stream order.
    """
    records, state, losses, aux = result
    auxs = aux if isinstance(aux, list) else [aux]
    n_active = np.concatenate(
        [np.asarray(a["n_active"]).reshape(-1) for a in auxs])
    overflow = np.concatenate(
        [np.asarray(a["overflow"]).reshape(-1) for a in auxs])
    idx = np.nonzero(overflow)[0]
    if idx.size == 0:
        return result

    # slots needed to hold every desired component, in steps of 4
    need = int(n_active[idx].max())
    n_slots2 = n_slots + -(-(need - n_slots) // 4) * 4
    # the subset's catalog: the device-detected one when detection ran
    if centers is None:
        cat = np.concatenate([np.asarray(a["centers"]) for a in auxs])
        act = np.concatenate([np.asarray(a["center_active"])
                              for a in auxs])
        sub_c, sub_a = cat[idx], act[idx]
    else:
        sub_c = np.asarray(centers)[idx]
        sub_a = (np.ones(sub_c.shape[:2], bool) if center_active is None
                 else np.asarray(center_active)[idx])

    # pad to a 16-row bucket by repeating row 0 with NO active catalog
    # rows: padded blends initialize empty and converge immediately
    n_pad = -(-idx.size // 16) * 16
    idx_pad = np.concatenate(
        [idx, np.full(n_pad - idx.size, idx[0], idx.dtype)])
    sub_c = np.concatenate(
        [sub_c, np.repeat(sub_c[:1], n_pad - idx.size, axis=0)])
    sub_a = np.concatenate(
        [sub_a, np.zeros((n_pad - idx.size,) + sub_a.shape[1:], bool)])

    take = lambda x: None if x is None else x[idx_pad]  # noqa: E731
    sub_records, sub_state, sub_losses, sub_aux = deblend_device_stream(
        take(images), take(variance), take(psfs), sub_c, model_psf,
        weights=take(weights), center_active=sub_a,
        scene_valid=take(scene_valid), box_size=box_size,
        n_slots=n_slots2, max_iter=max_iter, check_every=check_every,
        min_snr=min_snr, e_rel=e_rel, reweight=reweight, **kw)

    for pos, rec in zip(idx, sub_records):
        # "overflow" keeps meaning "overflowed the configured n_slots";
        # the retry itself ran at a layout that holds every component
        rec["overflow"] = True
        rec["overflow_retried"] = True
        records[pos] = rec

    sub_aux = dict(sub_aux, retry_indices=idx, retry_n_slots=n_slots2,
                   centers=sub_c, center_active=sub_a)
    states = state if isinstance(state, list) else [state]
    losses_l = losses if isinstance(losses, list) else [losses]
    return (records, states + [sub_state], losses_l + [sub_losses],
            auxs + [sub_aux])


def _union_catalogs(centers, active, det_c, det_a, radius, cap):
    """Per-blend union of an existing catalog with new detections:
    existing active rows keep their order, new peaks (already
    brightest-first) join if farther than ``radius`` from every kept
    row, truncated to ``cap`` rows."""
    centers = np.asarray(centers)
    active = (np.ones(centers.shape[:2], bool) if active is None
              else np.asarray(active))
    det_c = np.asarray(det_c)
    det_a = np.asarray(det_a)
    B = centers.shape[0]
    merged = []
    for b in range(B):
        rows = [tuple(map(int, c)) for c in centers[b][active[b]]]
        for p in det_c[b][det_a[b]]:
            p = tuple(map(int, p))
            if len(rows) >= cap:
                break
            if all((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
                   > radius ** 2 for q in rows):
                rows.append(p)
        merged.append(rows)
    K = max(1, max(len(r) for r in merged))
    out_c = np.zeros((B, K, 2), np.int32)
    out_a = np.zeros((B, K), bool)
    for b, rows in enumerate(merged):
        if rows:
            out_c[b, :len(rows)] = rows
            out_a[b, :len(rows)] = True
    return out_c, out_a


def _deblend_redetect(images, variance, psfs, centers, model_psf,
                      weights, center_active, scene_valid, *, box_size,
                      n_slots, max_iter, check_every, min_snr, e_rel,
                      reweight, chunk, compact, upload_dtype, redetect,
                      redetect_radius, retry_overflow=False, **kw):
    """detect -> fit -> detect-on-residuals -> refit orchestration for
    ``deblend_device_stream(redetect=N)``."""
    from .detection import detect_peaks_device
    from .batch import _data_in_axes

    # sanitize once at this level so the residual subtraction stays
    # finite (stream_setup re-sanitizes idempotently inside each pass);
    # host stacks stay numpy so the inner passes' upload_dtype
    # quantization still applies
    if isinstance(images, jnp.ndarray) or isinstance(variance,
                                                     jnp.ndarray):
        images = jnp.asarray(images)
        variance = jnp.asarray(variance)
        images, variance, _ = _sanitize_stacks(images, variance)
    else:
        images = np.ascontiguousarray(images)
        variance = np.ascontiguousarray(variance)
        images, variance, _ = _sanitize_stacks(images, variance, xp=np)

    cap = int(kw.get("max_peaks") or n_slots)
    scales = int(kw.get("detect_scales", 3))
    B = images.shape[0]
    spans = ([slice(0, B)] if (chunk is None or chunk >= B)
             else [slice(i, min(i + chunk, B))
                   for i in range(0, B, chunk)])

    def sub(x, sl):
        return None if x is None else x[sl]

    cur_c, cur_a = centers, center_active
    for pass_i in range(redetect + 1):
        out = deblend_device_stream(
            images, variance, psfs, cur_c, model_psf, weights=weights,
            center_active=cur_a, scene_valid=scene_valid,
            box_size=box_size, n_slots=n_slots, max_iter=max_iter,
            check_every=check_every, min_snr=min_snr, e_rel=e_rel,
            reweight=reweight, chunk=chunk, compact=compact,
            upload_dtype=upload_dtype,
            # the overflow retry applies once, on the final catalog
            retry_overflow=retry_overflow and pass_i == redetect, **kw)
        if pass_i == redetect:
            if cur_c is None:
                return out
            # surface the final (grown) catalog like the detection path
            records, state, losses, aux = out
            cur_c = np.asarray(cur_c)
            if cur_a is None:
                cur_a = np.ones(cur_c.shape[:2], bool)
            cur_a = np.asarray(cur_a)
            if isinstance(aux, list):
                o, new_aux = 0, []
                for a in aux:
                    if "retry_indices" in a:
                        # the overflow-retry entry indexes into the stream
                        # order (its rows beyond the indices are padding)
                        ri = np.asarray(a["retry_indices"])
                        new_aux.append(dict(a, centers=cur_c[ri],
                                            center_active=cur_a[ri]))
                        continue
                    n = np.asarray(a["n_active"]).shape[0]
                    new_aux.append(dict(a, centers=cur_c[o:o + n],
                                        center_active=cur_a[o:o + n]))
                    o += n
                aux = new_aux
            else:
                aux = dict(aux, centers=cur_c, center_active=cur_a)
            return records, state, losses, aux
        records, state, losses, aux = out
        if cur_c is None:
            auxs = aux if isinstance(aux, list) else [aux]
            cur_c = np.concatenate([np.asarray(a["centers"])
                                    for a in auxs])
            cur_a = np.concatenate([np.asarray(a["center_active"])
                                    for a in auxs])
        # residual re-detection, per chunk (the throwaway render setup
        # must respect the chunk memory bound like the fits do; its
        # re-run of the init program is part of the documented pass cost)
        if isinstance(state, list):
            states = state
        else:
            states = [jax.tree.map(lambda x: x[sl], state)
                      for sl in spans]
        det_cs, det_as = [], []
        for sl, st_c in zip(spans, states):
            cfg_r, data_r, _, _ = stream_setup(
                sub(images, sl), sub(variance, sl), sub(psfs, sl),
                sub(cur_c, sl), model_psf, weights=sub(weights, sl),
                center_active=sub(cur_a, sl),
                scene_valid=sub(scene_valid, sl), box_size=box_size,
                n_slots=n_slots, min_snr=min_snr, e_rel=e_rel, **kw)
            render = jax.vmap(lambda s, d: engine.render(s, d, cfg_r),
                              in_axes=(0, _data_in_axes(data_r)))
            resid = jnp.asarray(sub(images, sl)) - render(st_c, data_r)
            dc, da, _ = detect_peaks_device(
                resid, jnp.asarray(sub(variance, sl)),
                sub(scene_valid, sl), max_peaks=cap, scales=scales)
            det_cs.append(np.asarray(dc))
            det_as.append(np.asarray(da))
        cur_c, cur_a = _union_catalogs(cur_c, cur_a,
                                       np.concatenate(det_cs),
                                       np.concatenate(det_as),
                                       redetect_radius, cap)


def _concat_trees(trees):
    return jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.concatenate(xs, 0),
        *trees, is_leaf=lambda x: x is None)


def _concat_data(datas):
    """Concatenate batched BlendData leaves; shared (config-determined)
    monotonicity tables come from the first chunk."""
    from .batch import _SHARED_FIELDS

    stacked = _concat_trees([
        d._replace(**{name: None for name in _SHARED_FIELDS})
        for d in datas
    ])
    return stacked._replace(**{
        name: getattr(datas[0], name) for name in _SHARED_FIELDS
    })


def _collect_compacted(handles, points, max_iter, check_every, reweight):
    """Convergence compaction: after ``points[0]`` iterations, gather the
    still-active blends from ALL chunks into a small residual batch and
    continue only those, re-compacting at each further point until
    ``max_iter``.

    Converged blends freeze through the ``active`` mask but still COST
    compute inside a while-program batch, so a single straggler forces
    its whole chunk to the cap; compaction pays each tail segment only
    for the blends still running (residual batches padded up to 32-row
    buckets so their sizes hit a handful of compiled programs).
    """
    from .batch import (_SHARED_FIELDS, fit_batch_device_collect,
                        fit_batch_device_converged)

    outs, datas, auxs, losses_l = [], [], [], []
    config = handles[0][2]
    for handle, data, cfg, aux in handles:
        out, losses = fit_batch_device_collect(handle, points[0])
        outs.append(out)
        datas.append(data)
        auxs.append(aux)
        losses_l.append(losses)

    state = _concat_trees(outs)
    data = _concat_data(datas)
    aux = _concat_trees(auxs)
    n_rows = max(l.shape[0] for l in losses_l)
    losses = jnp.concatenate([
        jnp.pad(l, ((0, n_rows - l.shape[0]), (0, 0))) for l in losses_l
    ], axis=1)

    data_batched = data._replace(**{n: None for n in _SHARED_FIELDS})
    shared = {n: getattr(data, n) for n in _SHARED_FIELDS}

    for lo, hi in zip(points, list(points[1:]) + [max_iter]):
        if hi <= lo:
            continue
        idx = np.nonzero(np.asarray(state.active))[0]
        if not idx.size:
            break
        n_res = -(-idx.size // 32) * 32          # pad to a 32-bucket
        idx_pad = np.concatenate(
            [idx, np.full(n_res - idx.size, idx[0], idx.dtype)])
        take = lambda x: (None if x is None  # noqa: E731
                          else jnp.take(x, idx_pad, axis=0))
        res_state = jax.tree.map(take, state)
        res_data = jax.tree.map(
            take, data_batched,
            is_leaf=lambda x: x is None)._replace(**shared)
        # padding rows are duplicates of a real blend: freeze them
        pad_off = jnp.arange(n_res) < idx.size
        res_state = res_state._replace(active=res_state.active & pad_off)
        res_out, _ = fit_batch_device_converged(
            res_state, res_data, config, hi - lo, check_every=check_every)
        put = lambda x, r: x.at[jnp.asarray(idx)].set(  # noqa: E731
            r[:idx.size])
        state = jax.tree.map(put, state, res_out)

    records = stream_records(state, losses, aux, data=data, config=config,
                             reweight=reweight)
    return records, state, losses, aux
