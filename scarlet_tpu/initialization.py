"""Source initialization: host-side (init-time) bootstrapping of spectra and
morphologies from data.  Behavioral reference: scarlet/initialization.py.

This module grows with the main-path API; the lite path uses
:mod:`scarlet_tpu.lite.initialization`.
"""
from __future__ import annotations

import logging

import numpy as np

from .bbox import Box

logger = logging.getLogger("scarlet_tpu.initialization")

__all__ = [
    "get_pixel_spectrum",
    "get_psf_spectrum",
    "get_minimal_boxsize",
    "trim_morphology",
    "build_initialization_image",
    "init_all_sources",
    "init_source",
    "set_spectra_to_match",
]


def get_pixel_spectrum(sky_coord, observations, correct_psf=False, models=None,
                       concat=True):
    """Spectrum of a unit-flux single-pixel source at ``sky_coord``,
    optionally PSF-peak-corrected, concatenated over observations.

    Ref: scarlet/initialization.py:12-85.
    """
    if models is not None:
        assert correct_psf is False

    if not hasattr(observations, "__iter__"):
        observations = (observations,)
        models = (models,)
    elif models is not None:
        assert len(models) == len(observations)
    else:
        models = (None,) * len(observations)

    spectra = []
    for obs, model in zip(observations, models):
        pixel = obs.get_pixel(sky_coord)
        index = np.round(pixel).astype(int)
        spectrum = np.array(
            np.asarray(obs.data)[:, index[0], index[1]], copy=True)

        if correct_psf and obs.psf is not None:
            psf_model = np.asarray(obs.psf.get_model())
            psf_peak = psf_model.max(axis=(1, 2))
            spectrum /= psf_peak
        elif model is not None:
            model_value = np.asarray(model)[:, index[0], index[1]]
            spectrum /= model_value

        spectra.append(spectrum)

        if np.any(spectrum <= 0):
            msg = f"Zero or negative spectrum {spectrum} at {sky_coord}"
            if np.all(spectrum <= 0):
                logger.warning(msg)
            else:
                logger.info(msg)

    if concat:
        spectra = np.concatenate(spectra).reshape(-1)
    return spectra


def get_psf_spectrum(sky_coord, observations, compute_snr=False, concat=True):
    """PSF-weighted (matched-filter) photometry at ``sky_coord``; optionally
    also its SNR.  Ref: scarlet/initialization.py:88-170.
    """
    if not hasattr(observations, "__iter__"):
        observations = (observations,)

    spectra = []
    if compute_snr:
        snr_num, snr_denom = [], []

    for i, obs in enumerate(observations):
        pixel = obs.get_pixel(sky_coord)
        index = np.round(pixel).astype(int)

        psf = np.asarray(obs.psf.get_model())
        bbox = obs.psf.bbox + (0, *index)
        img = bbox.extract_from(np.asarray(obs.data))
        noise_rms = np.asarray(obs.noise_rms)
        noise = bbox.extract_from(np.where(np.isfinite(noise_rms),
                                           noise_rms, 0.0))
        # invalid-pixel mask: outside the observation or masked (inf rms)
        valid = bbox.extract_from(
            np.isfinite(noise_rms).astype(float)) > 0

        spectra.append([])
        for c in range(obs.C):
            mask = valid[c]
            psf_ = psf[c][mask]
            img_ = img[c][mask]
            img_psf = img_ @ psf_
            spectrum = img_psf / (psf_ @ psf_)
            spectra[i].append(spectrum)
            if compute_snr:
                noise_ = noise[c][mask]
                snr_num.append(img_psf)
                snr_denom.append((psf_ * noise_ ** 2) @ psf_)
        spectra[i] = np.array(spectra[i])

        if np.any(spectra[i] <= 0):
            msg = f"Zero or negative spectrum {spectra[i]} at {sky_coord}"
            if np.all(spectra[i] <= 0):
                logger.warning(msg)
            else:
                logger.info(msg)

    if concat:
        spectra = np.concatenate(spectra).reshape(-1)
    if compute_snr:
        snr = np.sum(snr_num) / np.sqrt(np.sum(snr_denom))
        return spectra, snr
    return spectra


def get_minimal_boxsize(size, min_size=21, increment=10):
    """Bucket a size into {21, 31, 41, ...}: small and quantized so jit
    recompiles stay rare.  Ref: scarlet/initialization.py:173-177.
    """
    boxsize = min_size
    while boxsize < size:
        boxsize += increment
    return boxsize


def trim_morphology(center_index, morph, bg_thresh=0, boxsize=None):
    """Zero sub-threshold pixels and cut a centered odd box around the
    remaining flux.  Ref: scarlet/initialization.py:180-210.
    """
    morph = np.array(morph, copy=True)
    mask = morph > bg_thresh
    morph[~mask] = 0

    bbox = Box.from_data(morph, min_value=0)
    if bbox.contains(center_index):
        size = 2 * max(
            (
                center_index[0] - bbox.start[-2],
                bbox.stop[0] - center_index[-2],
                center_index[1] - bbox.start[-1],
                bbox.stop[1] - center_index[-1],
            )
        )
    else:
        size = 0

    if boxsize is None:
        boxsize = get_minimal_boxsize(size)

    bottom = center_index[0] - boxsize // 2
    top = center_index[0] + boxsize // 2 + 1
    left = center_index[1] - boxsize // 2
    right = center_index[1] + boxsize // 2 + 1
    bbox = Box.from_bounds((bottom, top), (left, right))
    morph = bbox.extract_from(morph)
    return morph, bbox


def build_initialization_image(observations, spectra=None):
    """SNR-weighted detection coadd over same-grid observations, cached on
    observations[0].  Ref: scarlet/initialization.py:213-284.
    """
    from .models.renderer import NullRenderer, ConvolutionRenderer

    if not hasattr(observations, "__iter__"):
        observations = (observations,)
        spectra = (spectra,)
    assert len(observations) == len(spectra)

    model_frame = observations[0].model_frame

    if not hasattr(observations[0], "_detect"):
        detect, var = [], []
        for obs in observations:
            if not isinstance(obs.renderer, (NullRenderer,
                                             ConvolutionRenderer)):
                continue
            detect_ = np.zeros(model_frame.shape, dtype=model_frame.dtype)
            var_ = np.zeros(model_frame.shape, dtype=model_frame.dtype)
            data_slice, model_slice = obs.renderer.slices
            rms = np.where(np.isfinite(obs.noise_rms), obs.noise_rms, 0.0)
            cmap = obs.renderer.channel_map
            if cmap is None:
                cmap = slice(None)
            detect_[cmap][model_slice] += np.asarray(obs.data)[data_slice]
            var_[cmap][model_slice] += rms[data_slice] ** 2
            detect.append(detect_)
            var.append(var_)
        detect = np.array(detect)
        var = np.array(var)
        observations[0]._detect = (detect, var)

    detect, var = observations[0]._detect

    spectrum = []
    for i, obs in enumerate(observations):
        if not isinstance(obs.renderer, (NullRenderer, ConvolutionRenderer)):
            continue
        spectrum_ = np.zeros(model_frame.C)
        cmap = obs.renderer.channel_map
        if cmap is None:
            cmap = slice(None)
        if spectra[i] is not None:
            spectrum_[cmap] = spectra[i]
        else:
            spectrum_[cmap] = 1
        spectrum.append(spectrum_)
    spectrum = np.stack(spectrum, axis=0)[:, :, None, None]
    weight = np.zeros(var.shape)
    sel = var > 0
    weight[sel] = 1 / var[sel]
    weight = weight * spectrum
    detect_image = (weight * detect).sum(axis=(0, 1))
    var_image = (spectrum * weight).sum(axis=(0, 1))
    return detect_image, np.sqrt(var_image)


def init_all_sources(frame, centers, observations, thresh=1, max_components=1,
                     min_components=1, min_snr=50, shifting=False,
                     resizing=True, boxsize=None, fallback=True, silent=False,
                     set_spectra=True):
    """Initialize all sources, with the fallback ladder and optional joint
    spectrum solve.  Ref: scarlet/initialization.py:287-363.
    """
    if not hasattr(observations, "__iter__"):
        observations = (observations,)

    sources = []
    skipped = []
    for k, center in enumerate(centers):
        try:
            source = init_source(
                frame, center, observations, thresh=thresh,
                max_components=max_components, min_components=min_components,
                min_snr=min_snr, shifting=shifting, resizing=resizing,
                boxsize=boxsize, fallback=fallback,
            )
            sources.append(source)
        except Exception as e:
            logger.warning(f"Failed to initialize source {k}")
            if silent:
                skipped.append(k)
            else:
                raise e

    if set_spectra:
        set_spectra_to_match(sources, observations)
    return sources, skipped


def init_source(frame, center, observations, thresh=1, max_components=1,
                min_components=1, min_snr=50, shifting=False, resizing=True,
                boxsize=None, fallback=True):
    """Initialize one source, degrading the component count on failure
    (K -> ... -> compact).  Ref: scarlet/initialization.py:366-490.
    """
    from .models.source import ExtendedSource

    if not hasattr(observations, "__iter__"):
        observations = (observations,)

    if fallback:
        _, psf_snr = get_psf_spectrum(center, observations, compute_snr=True)
        max_components = int(np.min([
            max_components,
            np.max([min_components, np.floor(psf_snr / min_snr).astype(int)]),
        ]))

    while max_components >= 0:
        try:
            if max_components > 0:
                source = ExtendedSource(
                    frame, center, observations, thresh=thresh,
                    shifting=shifting, resizing=resizing, boxsize=boxsize,
                    K=max_components,
                )
            else:
                source = ExtendedSource(
                    frame, center, observations, shifting=shifting,
                    resizing=resizing, boxsize=boxsize, compact=True,
                )
            source.check_parameters()
        except ArithmeticError as e:
            if fallback:
                logger.info(
                    f"Could not initialize source at {center} with "
                    f"{max_components} components: {e}")
                max_components -= 1
                continue
            raise e
        return source


def set_spectra_to_match(sources, observations):
    """Joint weighted linear least-squares solve for all components'
    spectra given their rendered morphologies, with degenerate-model dedup.

    Ref: scarlet/initialization.py:493-588.
    """
    import jax.numpy as jnp
    from .models.component import FactorizedComponent, CombinedComponent

    if not hasattr(observations, "__iter__"):
        observations = (observations,)
    model_frame = observations[0].model_frame

    parameters = []
    update_of = []
    models = []
    for i, src in enumerate(sources):
        if isinstance(src, CombinedComponent):
            components = src.children
        else:
            components = (src,)
        for j, c in enumerate(components):
            p = None
            if isinstance(c, FactorizedComponent):
                own = c.parameters
                for q in own:
                    if q.name == "spectrum":
                        p = q
                        break
            parameters.append(p)
            if p is not None and not p.fixed:
                p.set(np.ones(p.shape))
            model = np.asarray(c.get_model(frame=model_frame))

            K_ = len(models)
            update_of.append(K_)
            for l in range(K_):
                if np.allclose(model, models[l]):
                    update_of[-1] = l
                    logger.warning(
                        f"Source {i}, Component {j} has a model identical to "
                        "another component; spectra will be identical.")
            if update_of[-1] == K_:
                models.append(model)
    models = np.array(models)
    K_ = len(models)

    for obs in observations:
        C = obs.C
        images = np.asarray(obs.data)
        weights = np.asarray(obs.weights)
        morphs = np.stack(
            [np.asarray(obs.render(jnp.asarray(model))) for model in models],
            axis=0)
        spectra = np.zeros((K_, C))
        for c in range(C):
            im = images[c].reshape(-1)
            w = weights[c].reshape(-1)
            m = morphs[:, c, :, :].reshape(K_, -1)
            mw = m * w[None, :]
            # components whose flux lies mostly in zero-weight pixels are
            # excluded from the solve in this channel
            with np.errstate(invalid="ignore", divide="ignore"):
                nonzero = np.sum(mw, axis=1) / np.sum(m, axis=1) / \
                    np.mean(w) > 0.1
            nonzero = np.flatnonzero(nonzero)
            if len(nonzero) == K_:
                covar = np.linalg.inv(mw @ m.T)
                spectra[:, c] = covar @ m @ (im * w)
            elif len(nonzero) > 0:
                covar = np.linalg.inv(mw[nonzero] @ m[nonzero].T)
                spectra[nonzero, c] = covar @ m[nonzero] @ (im * w)

        cmap = obs.renderer.channel_map
        if cmap is None:
            cmap = slice(None)
        for k, p in enumerate(parameters):
            if p is not None and not p.fixed:
                val = np.asarray(p.value).copy()
                val[cmap] = spectra[update_of[k]]
                p.set(val)

    for p in parameters:
        if p is not None and p.constraint is not None:
            p.set(p.constraint(p.value, 0))
