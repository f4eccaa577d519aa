"""Lite blend model classes.

API mirrors scarlet.lite (reference scarlet/lite/models.py) but the fit path
is the compiled engine in :mod:`scarlet_tpu.lite.engine`: ``LiteBlend.fit``
packs all components into structure-of-arrays state, runs the whole
proximal-Adam loop as one ``lax.scan`` XLA program, and unpacks the result
back into the component objects.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..bbox import Box, overlapped_slices
from ..ops import fft as fft_ops
from ..models.constraint import MonotonicityConstraint
from ..initialization import get_minimal_boxsize
from .parameters import LiteParameter, AdaproxParameter
from .utils import insert_image
from . import engine

__all__ = [
    "LiteComponent",
    "LiteFactorizedComponent",
    "LiteSource",
    "LiteObservation",
    "LiteBlend",
]


def _default_platform(jax_mod):
    """Platform jit-compiled code will actually run on: an active
    ``jax.default_device(...)`` context wins over the default backend."""
    dev = jax_mod.config.jax_default_device
    return dev.platform if dev is not None else jax_mod.default_backend()


def _param_value(p):
    return p.x if isinstance(p, LiteParameter) else jnp.asarray(p)


class LiteComponent:
    """A (sed, morph) component anchored at ``bbox`` inside the blend.

    Ref: scarlet/lite/models.py:19-133.
    """

    def __init__(self, center, bbox, sed=None, morph=None, initialized=False,
                 bg_thresh=0.25, bg_rms=0):
        self._center = center
        self._bbox = bbox
        self._sed = sed
        self._morph = morph
        self.initialized = initialized
        self.bg_thresh = bg_thresh
        self.bg_rms = bg_rms

    @property
    def center(self):
        return self._center

    @property
    def bbox(self):
        return self._bbox

    @property
    def sed(self):
        return _param_value(self._sed) if self._sed is not None else None

    @property
    def morph(self):
        return _param_value(self._morph) if self._morph is not None else None

    def get_model(self, bbox=None):
        model = self.sed[:, None, None] * self.morph[None, :, :]
        if bbox is not None:
            slices = overlapped_slices(bbox, self.bbox)
            _model = np.zeros(bbox.shape, dtype=np.asarray(model).dtype)
            _model[slices[0]] = np.asarray(model)[slices[1]]
            model = _model
        return model

    def resize(self):
        """Shrink or grow the box based on edge flux.

        Ref: lite/models.py:73-127.  Host-side; returns True if resized.
        """
        if self.bg_thresh is None:
            return False
        morph = np.asarray(self.morph)
        size = max(morph.shape)

        dist = 0
        while (
            np.all(morph[dist, :] == 0)
            and np.all(morph[-(dist + 1), :] == 0)
            and np.all(morph[:, dist] == 0)
            and np.all(morph[:, -(dist + 1)] == 0)
            and dist < size // 2
        ):
            dist += 1

        new_size = get_minimal_boxsize(size - 2 * dist)
        if new_size < size:
            dist = (size - new_size) // 2
            self.bbox.origin = (self.bbox.origin[0], self.bbox.origin[1] + dist,
                                self.bbox.origin[2] + dist)
            self.bbox.shape = (self.bbox.shape[0], new_size, new_size)
            self._morph.shrink(dist)
            self.slices = overlapped_slices(self.model_bbox, self.bbox)
            return True

        model = np.asarray(self.get_model())
        edges = [model[:, :, 0], model[:, :, -1], model[:, 0, :], model[:, -1, :]]
        edge_flux = np.array([np.sum(e) for e in edges])
        edge_mask = np.array([max(np.sum(e > 0), 1) for e in edges])
        bg_rms = np.asarray(self.bg_rms)
        if np.any(edge_flux / edge_mask > self.bg_thresh * np.mean(bg_rms)):
            new_size = get_minimal_boxsize(size + 1)
            dist = (new_size - size) // 2
            self.bbox.origin = (self.bbox.origin[0], self.bbox.origin[1] - dist,
                                self.bbox.origin[2] - dist)
            self.bbox.shape = (self.bbox.shape[0], new_size, new_size)
            self._morph.grow(self.bbox.shape[1:], dist)
            self.slices = overlapped_slices(self.model_bbox, self.bbox)
            return True
        return False

    def __repr__(self):
        return "LiteComponent"


class LiteFactorizedComponent(LiteComponent):
    """Factorized component with analytic gradients and the lite prox chain.

    Ref: scarlet/lite/models.py:136-258.
    """

    def __init__(self, sed, morph, center, bbox, model_bbox, bg_rms,
                 bg_thresh=0.25, floor=1e-20, fit_center_radius=1):
        super().__init__(center, bbox, sed, morph, initialized=True,
                         bg_thresh=bg_thresh, bg_rms=bg_rms)
        self.monotonicity = MonotonicityConstraint(
            neighbor_weight="angle", min_gradient=0,
            fit_center_radius=fit_center_radius,
        )
        self.floor = floor
        self.model_bbox = model_bbox
        if isinstance(self._sed, LiteParameter):
            self._sed.grad = self.grad_sed
            self._sed.prox = self.prox_sed
        if isinstance(self._morph, LiteParameter):
            self._morph.grad = self.grad_morph
            self._morph.prox = self.prox_morph
        self.slices = overlapped_slices(model_bbox, bbox)

    def grad_sed(self, input_grad, sed, morph):
        """d(logL)/d(sed): project the scene gradient into the box and
        contract with the morphology.  Ref: lite/models.py:206-210."""
        _grad = np.zeros(self.bbox.shape, dtype=np.asarray(morph).dtype)
        _grad[self.slices[1]] = np.asarray(input_grad)[self.slices[0]]
        return jnp.einsum("chw,hw->c", jnp.asarray(_grad), jnp.asarray(morph))

    def grad_morph(self, input_grad, morph, sed):
        """d(logL)/d(morph). Ref: lite/models.py:212-216."""
        _grad = np.zeros(self.bbox.shape, dtype=np.asarray(morph).dtype)
        _grad[self.slices[1]] = np.asarray(input_grad)[self.slices[0]]
        return jnp.einsum("c,chw->hw", jnp.asarray(sed), jnp.asarray(_grad))

    def prox_sed(self, sed, prox_step=0):
        """Floor the SED. Ref: lite/models.py:218-222."""
        return jnp.maximum(jnp.asarray(sed), self.floor)

    def prox_morph(self, morph, prox_step=0):
        """Monotonicity -> background threshold (or positivity) -> center
        floor -> max normalization.  Ref: lite/models.py:224-244."""
        morph = jnp.asarray(morph)
        morph = self.monotonicity(morph, 0)
        if self.bg_thresh is not None:
            bg_thresh = jnp.asarray(self.bg_rms) * self.bg_thresh
            model = self.sed[:, None, None] * morph[None, :, :]
            cut = jnp.all(model < bg_thresh[:, None, None], axis=0)
            morph = jnp.where(cut, 0.0, morph)
        else:
            morph = jnp.maximum(morph, 0)
        center = (morph.shape[0] // 2, morph.shape[1] // 2)
        morph = morph.at[center].set(jnp.maximum(morph[center], self.floor))
        return morph / jnp.max(morph)

    def update(self, it, input_grad):
        """Eager per-component update (API parity path; the compiled engine
        is used by LiteBlend.fit).  Ref: lite/models.py:246-252."""
        sed = self.sed
        self._sed.update(it, input_grad, self.morph)
        self._morph.update(it, input_grad, sed)

    def __repr__(self):
        return "LiteFactorizedComponent"


class LiteSource:
    """Components belonging to one astrophysical object.

    Ref: scarlet/lite/models.py:261-330.
    """

    def __init__(self, components, dtype=np.float32):
        self.components = components
        self.dtype = dtype
        self.flux = None
        self.flux_box = None

    @property
    def n_components(self):
        return len(self.components)

    @property
    def center(self):
        return self.components[0].center if not self.is_null else None

    @property
    def is_null(self):
        return self.n_components == 0

    @property
    def bbox(self):
        if self.n_components == 0:
            return Box((0, 0, 0))
        bbox = self.components[0].bbox
        for component in self.components[1:]:
            bbox = bbox | component.bbox
        return bbox

    def get_model(self, bbox=None, use_flux=False):
        if self.n_components == 0:
            return 0
        if use_flux:
            if bbox is None:
                return self.flux
            return insert_image(bbox, self.flux_box, self.flux)
        if bbox is None:
            bbox = self.bbox
        model = np.zeros(bbox.shape, dtype=self.dtype)
        for component in self.components:
            slices = overlapped_slices(bbox, component.bbox)
            model[slices[0]] += np.asarray(component.get_model())[slices[1]]
        return model

    def __repr__(self):
        return f"LiteSource<{len(self.components)}>"


class LiteObservation:
    """Fused Observation+Renderer for same-grid multiband data.

    Ref: scarlet/lite/models.py:333-476.  The difference kernel and its
    flipped gradient kernel are precomputed; FFT convolution uses the
    centered-FFT engine and the "real" mode uses an XLA depthwise
    convolution.
    """

    def __init__(self, images, variance, weights, psfs, model_psf=None,
                 noise_rms=None, bbox=None, padding=3, convolution_mode="fft"):
        self.images = jnp.asarray(images)
        self.variance = jnp.asarray(variance)
        self.weights = jnp.asarray(weights)
        psfs = jnp.asarray(psfs)
        if psfs.dtype != self.images.dtype:
            psfs = psfs.astype(self.images.dtype)
        self.psfs = psfs

        assert convolution_mode in ("fft", "real"), \
            "convolution_mode must be either 'fft' or 'real'"
        self.mode = convolution_mode
        if noise_rms is None:
            noise_rms = jnp.mean(jnp.sqrt(self.variance), axis=(1, 2))
        self.noise_rms = jnp.asarray(noise_rms)

        self.model_psf = None if model_psf is None else jnp.asarray(model_psf)
        self.padding = padding
        if model_psf is not None:
            self.diff_kernel = fft_ops.match_psf(self.psfs, self.model_psf,
                                                 padding=padding)
            diff_img = self.diff_kernel.image
            self.grad_kernel = fft_ops.Fourier(diff_img[:, ::-1, ::-1])
        else:
            self.diff_kernel = self.grad_kernel = None

        self.bbox = Box(self.images.shape) if bbox is None else bbox

    def convolve(self, image, mode=None, grad=False):
        """Convolve a (C, H, W) image to the observed seeing.

        Ref: lite/models.py:376-410.
        """
        kernel = self.grad_kernel if grad else self.diff_kernel
        if kernel is None:
            return image
        if mode is None:
            mode = self.mode
        image = jnp.asarray(image)
        if mode == "fft":
            return fft_ops.convolve(
                fft_ops.Fourier(image), kernel, axes=(1, 2),
                return_fourier=False,
            )
        if mode == "real":
            return _depthwise_convolve(image, kernel.image)
        raise ValueError(f"mode must be 'fft' or 'real', got {mode}")

    def render(self, model):
        return self.convolve(model)

    @property
    def data(self):
        return self.images

    @property
    def shape(self):
        return self.images.shape

    @property
    def n_bands(self):
        return self.images.shape[0]

    @property
    def dtype(self):
        return self.images.dtype

    def __getitem__(self, i):
        images = self.images[i]
        variance = self.variance[i]
        weights = self.weights[i]
        psfs = self.psfs[i]
        noise_rms = self.noise_rms[i]
        if images.ndim == 2:
            images = images[None]
            variance = variance[None]
            weights = weights[None]
            psfs = psfs[None]
            noise_rms = jnp.asarray([noise_rms])
        return LiteObservation(
            images, variance, weights, psfs, model_psf=self.model_psf,
            noise_rms=noise_rms, bbox=self.bbox, padding=self.padding,
            convolution_mode=self.mode,
        )


def _depthwise_convolve(image, kernel):
    """True (flipped-kernel) per-channel convolution via XLA conv; odd
    kernels align with the centered-FFT convention."""
    import jax
    C = image.shape[0]
    kh, kw = kernel.shape[-2:]
    assert kh % 2 == 1 and kw % 2 == 1, "kernel must be odd-sized"
    k = jnp.flip(kernel, axis=(-2, -1))
    out = jax.lax.conv_general_dilated(
        image[None].astype(k.dtype),
        k[:, None],
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out


class LiteBlend:
    """A blend: sources + one observation, with a compiled fit.

    Ref: scarlet/lite/models.py:479-624.
    """

    def __init__(self, sources, observation):
        self.sources = sources
        self.components = []
        for source in sources:
            self.components.extend(source.components)
        self.observation = observation
        self.it = 0
        self.loss = []

    @property
    def bbox(self):
        return self.observation.bbox

    def get_model(self, convolve=False, use_flux=False):
        model = np.zeros(self.bbox.shape, dtype=np.asarray(
            self.observation.images).dtype)
        if use_flux:
            for src in self.sources:
                slices = overlapped_slices(self.bbox, src.flux_box)
                model[slices[0]] += np.asarray(src.flux)
        else:
            for component in self.components:
                slices = overlapped_slices(self.bbox, component.bbox)
                _model = np.asarray(component.get_model())
                model[slices[0]] += _model[slices[1]]
            if convolve:
                return self.observation.convolve(jnp.asarray(model))
        return model

    def grad_logL(self):
        """Eager gradient of logL wrt the unconvolved model
        (lite/models.py:537-545); the compiled engine inlines this."""
        model = jnp.asarray(self.get_model(convolve=True))
        obs = self.observation
        self.loss.append(float(
            -0.5 * jnp.sum(obs.weights * (obs.images - model) ** 2)))
        grad = obs.weights * (model - obs.images)
        return obs.convolve(grad, grad=True)

    def fit_spectra(self, clip=False):
        """Joint linear least-squares fit of all SEDs given current
        morphologies.  Ref: lite/models.py:547-581."""
        from .initialization import multifit_seds

        morphs = [np.asarray(c.morph) for c in self.components]
        boxes = [c.bbox[1:] for c in self.components]
        fit_seds = multifit_seds(self.observation, morphs, boxes)
        for idx, component in enumerate(self.components):
            sed = np.maximum(fit_seds[idx], 0)
            if isinstance(component._sed, LiteParameter):
                component._sed.x = jnp.asarray(sed)
            else:
                component._sed = jnp.asarray(sed)

        if clip:
            components = []
            for src in self.sources:
                kept = [
                    c for c in src.components
                    if np.any(np.asarray(c.sed) > 0)
                    and np.any(np.asarray(c.morph) > 0)
                ]
                src.components = kept
                components.extend(kept)
            self.components = components
        else:
            for c in self.components:
                if isinstance(c, LiteFactorizedComponent):
                    c._sed.x = c.prox_sed(c.sed)
        return self

    @property
    def log_likelihood(self):
        return np.array(self.loss)

    # -- compiled fit ------------------------------------------------------
    def engine_setup(self, e_rel=1e-4, min_iter=1, bucket_mode="single",
                     scene_shape=None, box_size=None, n_slots=None,
                     fft_shape=None, platform=None):
        """Public access to the (config, data, state) pytrees of the
        compiled engine — the entry point for batched fitting
        (scarlet_tpu.parallel).

        ``bucket_mode``: "single" packs every component into one physical
        box bucket (fewer op streams — faster on TPU at typical sizes) with
        per-component logical-box masks; "per-size" groups components into
        per-size buckets (less per-pixel work when sizes vary wildly).

        The layout overrides build this blend to a *shared* static layout
        so distinct blends can be stacked into one batch
        (``scarlet_tpu.parallel.pack_blends``):

        - ``scene_shape`` (C, H, W): zero-pad images/weights bottom-right
          to this shape (weight-0 padding never enters the likelihood);
        - ``box_size``: force the single bucket's physical box (odd);
        - ``n_slots``: pad the component count with ``comp_active=False``
          null slots;
        - ``fft_shape``: use this (even, >= minimal exact) spatial FFT
          shape instead of the minimal one.
        """
        return self._engine_setup(e_rel, min_iter, bucket_mode=bucket_mode,
                                  scene_shape=scene_shape, box_size=box_size,
                                  n_slots=n_slots, fft_shape=fft_shape,
                                  platform=platform)

    def _engine_setup(self, e_rel, min_iter, bucket_mode="single",
                      scene_shape=None, box_size=None, n_slots=None,
                      fft_shape=None, platform=None):
        import jax as _jax

        if platform is None:
            platform = _default_platform(_jax)
        if bucket_mode not in ("single", "per-size"):
            raise ValueError(
                f"bucket_mode must be 'single' or 'per-size', "
                f"got {bucket_mode!r}")
        if bucket_mode != "single" and (box_size is not None or
                                        n_slots is not None):
            raise ValueError("layout overrides require bucket_mode='single'")
        obs = self.observation
        comps = self.components
        C, H, W = obs.shape
        images = np.asarray(obs.images)
        weights = np.asarray(obs.weights)
        scene_mask = None
        if scene_shape is not None:
            if scene_shape[0] != C or scene_shape[1] < H or \
                    scene_shape[2] < W:
                raise ValueError(
                    f"scene_shape {scene_shape} cannot hold {(C, H, W)}")
            pad = ((0, 0), (0, scene_shape[1] - H), (0, scene_shape[2] - W))
            images = np.pad(images, pad)
            weights = np.pad(weights, pad)
            # clip model flux at the TRUE scene edge so the shared-layout
            # fit equals this blend's natural-layout fit exactly (always
            # set when a shared layout is requested, so batches stack)
            scene_mask = np.zeros(scene_shape[1:], dtype=images.dtype)
            scene_mask[:H, :W] = 1.0
            _, H, W = scene_shape
        dtype = images.dtype

        # --- group components into size buckets (capped at scene size:
        # flux outside the scene never enters the likelihood) ---
        cap = max(H, W) + 1
        sizes = []
        for c in comps:
            size = min(max(c.bbox.shape[-2], c.bbox.shape[-1]), cap)
            if size % 2 == 0:
                size += 1
            sizes.append(size)
        if bucket_mode == "single":
            sizes = [max(sizes)] * len(sizes)
            if box_size is not None:
                size = min(int(box_size), cap)
                if size % 2 == 0:
                    size += 1
                if size < max(sizes):
                    raise ValueError(
                        f"box_size {box_size} smaller than required "
                        f"{max(sizes)}")
                sizes = [size] * len(sizes)
        bucket_sizes = sorted(set(sizes))
        bucket_of = {s: b for b, s in enumerate(bucket_sizes)}
        nb = len(bucket_sizes)

        if obs.diff_kernel is not None:
            if fft_shape is None:
                # smallest exact same-crop (even, 5-smooth) shape: the fit
                # only keeps the scene-size center crop, so circular
                # aliasing in the discarded margin is free — ~1.6x less
                # FFT work than the full linear-convolution shape
                fft_shape = fft_ops.minimal_same_fft_shape(
                    images, obs.diff_kernel.image, axes=(1, 2))
            diff_kernel = obs.diff_kernel.image
        else:
            fft_shape = None
            diff_kernel = None

        bg_threshes = {c.bg_thresh for c in comps}
        assert len(bg_threshes) == 1, \
            "engine requires a common bg_thresh across components"
        bg_thresh = bg_threshes.pop()

        first = comps[0]
        fc_radius = getattr(
            getattr(first, "monotonicity", None), "fit_center_radius", 1) or 1
        floor = getattr(first, "floor", 1e-20)

        from .parameters import FistaParameter

        use_fista = all(isinstance(c._sed, FistaParameter) for c in comps)

        # --- per-bucket state arrays ---
        counts = [sizes.count(s) for s in bucket_sizes]
        if n_slots is not None:
            if n_slots < counts[0]:
                raise ValueError(
                    f"n_slots {n_slots} smaller than component count "
                    f"{counts[0]}")
            counts = [int(n_slots)]
        seds = [np.zeros((k, C), dtype=dtype) for k in counts]
        morphs = [np.zeros((k, s, s), dtype=dtype)
                  for k, s in zip(counts, bucket_sizes)]
        # null (padding) slots keep a centered origin so they never widen
        # the overhang-derived scene_pad
        origins = [np.tile(np.asarray([[(H - s) // 2, (W - s) // 2]],
                                      np.int32), (k, 1))
                   for k, s in zip(counts, bucket_sizes)]
        m_sed = [np.zeros_like(a) for a in seds]
        v_sed = [np.zeros_like(a) for a in seds]
        vhat_sed = [np.zeros_like(a) for a in seds]
        m_mor = [np.zeros_like(a) for a in morphs]
        v_mor = [np.zeros_like(a) for a in morphs]
        vhat_mor = [np.zeros_like(a) for a in morphs]
        z_sed = [np.zeros_like(a) for a in seds]
        z_mor = [np.zeros_like(a) for a in morphs]
        t_sed = [np.ones((k,), dtype=dtype) for k in counts]
        t_mor = [np.ones((k,), dtype=dtype) for k in counts]
        fista_steps = [np.zeros((k,), dtype=dtype) for k in counts]
        box_masks = [np.zeros((k, s, s), dtype=dtype)
                     for k, s in zip(counts, bucket_sizes)]

        slots = [0] * nb
        placements = []   # per component: (bucket, slot, dy, dx, h, w,
                          #                 cy, cx, h0, w0)
        for ci, c in enumerate(comps):
            b = bucket_of[sizes[ci]]
            Hb = bucket_sizes[b]
            k = slots[b]
            slots[b] += 1

            _, h0, w0 = c.bbox.shape
            morph_k = np.asarray(c.morph)
            oy, ox = c.bbox.origin[-2], c.bbox.origin[-1]
            # center-crop morphologies larger than the bucket
            cy = (h0 - Hb) // 2 if h0 > Hb else 0
            cx = (w0 - Hb) // 2 if w0 > Hb else 0
            h = min(h0, Hb)
            w = min(w0, Hb)
            morph_k = morph_k[cy:cy + h, cx:cx + w]
            oy += cy
            ox += cx
            dy = (Hb - h) // 2
            dx = (Hb - w) // 2
            placements.append((b, k, dy, dx, h, w, cy, cx, h0, w0))
            seds[b][k] = np.asarray(c.sed)
            morphs[b][k, dy:dy + h, dx:dx + w] = morph_k
            box_masks[b][k, dy:dy + h, dx:dx + w] = 1.0
            origins[b][k] = (oy - dy, ox - dx)
            if isinstance(c._sed, AdaproxParameter):
                st = c._sed.state
                m_sed[b][k] = np.asarray(st.m)
                v_sed[b][k] = np.asarray(st.v)
                vhat_sed[b][k] = np.maximum(np.asarray(st.vhat), 0)
            if isinstance(c._morph, AdaproxParameter):
                st = c._morph.state
                crop = (slice(cy, cy + h), slice(cx, cx + w))
                m_mor[b][k, dy:dy + h, dx:dx + w] = np.asarray(st.m)[crop]
                v_mor[b][k, dy:dy + h, dx:dx + w] = np.asarray(st.v)[crop]
                vhat_mor[b][k, dy:dy + h, dx:dx + w] = np.maximum(
                    np.asarray(st.vhat)[crop], 0)
            if use_fista:
                crop = (slice(cy, cy + h), slice(cx, cx + w))
                z_sed[b][k] = np.asarray(c._sed.state.z)
                t_sed[b][k] = float(c._sed.state.t)
                z_mor[b][k, dy:dy + h, dx:dx + w] = \
                    np.asarray(c._morph.state.z)[crop]
                t_mor[b][k] = float(c._morph.state.t)
                fista_steps[b][k] = float(c._sed.step)
        self._engine_placements = placements

        # exact scene padding: largest padded-box overhang past the scene
        # edges (+1 so dynamic_update_slice never clamps)
        overhang = 1
        for b, Hb in enumerate(bucket_sizes):
            if counts[b] == 0:
                continue
            overhang = max(
                overhang,
                -origins[b].min(initial=0),
                (origins[b][:, 0] + Hb - H).max(initial=0),
                (origins[b][:, 1] + Hb - W).max(initial=0),
            )
        scene_pad = min(int(overhang) + 1, max(bucket_sizes))

        mono_n_iters = []
        for s in bucket_sizes:
            _, _, n_it = engine.monotonicity_tables((s, s), fc_radius,
                                                    "angle")
            mono_n_iters.append(n_it)

        config = engine.LiteFitConfig(
            scene_shape=(C, H, W),
            box_shapes=tuple((s, s) for s in bucket_sizes),
            bucket_counts=tuple(counts),
            fft_shape=fft_shape,
            mono_n_iters=tuple(mono_n_iters),
            floor=floor,
            bg_thresh=bg_thresh,
            e_rel=e_rel,
            min_iter=min_iter,
            fit_center_radius=fc_radius,
            # VMEM-resident monotonicity + scene-placement kernels on
            # accelerators; the fused XLA paths on CPU.  ``platform``
            # says where the FIT will run; default = the current context
            # (a jax.default_device(cpu) context overrides the backend)
            use_pallas=platform != "cpu",
            use_pallas_scene=platform != "cpu",
            # matmul-DFT convolution rides the MXU on accelerators; the
            # XLA FFT wins on CPU (pocketfft)
            conv_mode="dft" if platform != "cpu" else "fft",
            scene_pad=scene_pad,
            optimizer="fista" if use_fista else "adaprox",
            # persistent lane-packed morphology layout inside the fit
            # programs (engine.packed_morphs_ok gates applicability)
            packed_morphs=platform != "cpu",
        )

        data = engine.make_blend_data(
            images, weights, diff_kernel, obs.noise_rms, config)
        data = data._replace(
            box_masks=tuple(jnp.asarray(m) for m in box_masks))
        if scene_mask is not None:
            data = data._replace(scene_mask=jnp.asarray(scene_mask))
        if use_fista:
            data = data._replace(
                fista_step=tuple(jnp.asarray(f) for f in fista_steps))

        if use_fista:
            from ..optim import FistaState

            sed_opt = tuple(
                FistaState(z=jnp.asarray(z), t=jnp.asarray(t))
                for z, t in zip(z_sed, t_sed))
            morph_opt = tuple(
                FistaState(z=jnp.asarray(z), t=jnp.asarray(t))
                for z, t in zip(z_mor, t_mor))
        else:
            sed_opt = tuple(
                engine.init_adaprox_state(jnp.asarray(s), m=m, v=v, vhat=vh)
                for s, m, v, vh in zip(seds, m_sed, v_sed, vhat_sed))
            morph_opt = tuple(
                engine.init_adaprox_state(jnp.asarray(s), m=m, v=v, vhat=vh)
                for s, m, v, vh in zip(morphs, m_mor, v_mor, vhat_mor))
        comp_active = [
            np.arange(k) < slots[b] for b, k in enumerate(counts)
        ]
        state = engine.make_blend_state(
            seds, morphs, origins, comp_active=comp_active,
            sed_opt=sed_opt, morph_opt=morph_opt,
        )
        state = state._replace(it=jnp.asarray(self.it, jnp.int32))
        return config, data, state

    def _write_back(self, state):
        from .parameters import FistaParameter
        from ..optim import FistaState

        def embed(sub, cy, cx, h, w, h0, w0):
            """Place the engine's (possibly cropped) box back into the
            component's original box shape."""
            if h0 == h and w0 == w:
                return jnp.asarray(sub)
            full = np.zeros((h0, w0), dtype=np.asarray(sub).dtype)
            full[cy:cy + h, cx:cx + w] = np.asarray(sub)
            return jnp.asarray(full)

        for ci, c in enumerate(self.components):
            b, k, dy, dx, h, w, cy, cx, h0, w0 = self._engine_placements[ci]
            sl = (slice(dy, dy + h), slice(dx, dx + w))
            sed = np.asarray(state.seds[b][k])
            morph = embed(np.asarray(state.morphs[b][k])[sl], cy, cx, h, w,
                          h0, w0)
            if isinstance(c._sed, LiteParameter):
                c._sed.x = jnp.asarray(sed)
                if isinstance(c._sed, AdaproxParameter):
                    c._sed.state = engine.AdaproxState(
                        m=state.sed_opt[b].m[k], v=state.sed_opt[b].v[k],
                        vhat=state.sed_opt[b].vhat[k])
                elif isinstance(c._sed, FistaParameter):
                    c._sed.state = FistaState(z=state.sed_opt[b].z[k],
                                              t=state.sed_opt[b].t[k])
            else:
                c._sed = jnp.asarray(sed)
            if isinstance(c._morph, LiteParameter):
                c._morph.x = morph
                if isinstance(c._morph, AdaproxParameter):
                    c._morph.state = engine.AdaproxState(
                        m=embed(np.asarray(state.morph_opt[b].m[k])[sl],
                                cy, cx, h, w, h0, w0),
                        v=embed(np.asarray(state.morph_opt[b].v[k])[sl],
                                cy, cx, h, w, h0, w0),
                        vhat=embed(np.asarray(state.morph_opt[b].vhat[k])[sl],
                                   cy, cx, h, w, h0, w0))
                elif isinstance(c._morph, FistaParameter):
                    c._morph.state = FistaState(
                        z=embed(np.asarray(state.morph_opt[b].z[k])[sl],
                                cy, cx, h, w, h0, w0),
                        t=state.morph_opt[b].t[k])
            else:
                c._morph = morph

    def fit(self, max_iter, e_rel=1e-4, min_iter=1, resize=10, reweight=True,
            bucket_mode="single"):
        """Fit all components with the compiled engine.

        ``resize``: every ``resize`` iterations the scan is interrupted for a
        host-side box-resize check (grow/shrink), mirroring the reference
        cadence (lite/models.py:613-616); ``resize=None`` runs one
        uninterrupted scan.

        ``bucket_mode``: "single" (default) packs every component into one
        physical box size; "per-size" groups components by their quantized
        box size (see :meth:`engine_setup`).
        """
        from .measure import weight_sources

        total = 0
        segment = max_iter if resize is None else int(resize)
        while total < max_iter:
            n = min(segment, max_iter - total)
            config, data, state = self._engine_setup(
                e_rel, min_iter, bucket_mode=bucket_mode)
            state, losses = engine.fit_scan(state, data, config, n)
            ran = int(state.it) - self.it
            self.loss.extend(np.asarray(losses)[:ran].tolist())
            self.it = int(state.it)
            self._write_back(state)
            total += n
            if ran < n:       # converged inside the segment
                break
            if resize is not None and total < max_iter:
                for c in self.components:
                    if hasattr(c, "resize"):
                        c.resize()
        if reweight:
            weight_sources(self)
        return self.it, (self.loss[-1] if self.loss else np.nan)
