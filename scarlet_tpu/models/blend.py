"""Blend: the blended scene and its fitting engine.

Behavioral reference: scarlet/blend.py.  The reference drives autograd +
``proxmin.adaprox`` per iteration in Python; here the whole update step —
forward model (scatter-add of boxed sources), likelihood over all
observations, ``jax.grad``, the adaprox moment update, and every prox — is
one jit-compiled function over the parameter pytree.  Box resizing restarts
(``UpdateException``) happen between steps exactly as in the reference
(blend.py:196-198) and simply trigger a re-trace at the new (bucketed)
shapes.
"""
from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..bbox import overlapped_slices
from ..optim import init_adaprox_state, adaprox_step
from .component import CombinedComponent
from .model import UpdateException

logger = logging.getLogger("scarlet_tpu.blend")

__all__ = ["Blend"]


class Blend(CombinedComponent):
    """Sources + observations with a compiled proximal-Adam fit.

    Ref: scarlet/blend.py:49-308.
    """

    def __init__(self, sources, observations):
        if hasattr(sources, "__iter__"):
            self.sources = sources
        else:
            self.sources = (sources,)
        if hasattr(observations, "__iter__"):
            self.observations = observations
        else:
            self.observations = (observations,)
        super().__init__(self.sources)
        self.loss = []

    @property
    def bbox(self):
        return self.frame.bbox

    def get_model(self, *parameters, frame=None):
        """Scatter-add all source models into the scene.

        Ref: blend.py:200-244; jnp scatter-adds autodiff natively, so no
        custom vjp registration is needed.
        """
        models = self.get_models_of_children(*parameters, frame=None)
        if frame is None:
            frame = self.frame
        if frame == self.frame:
            slices = tuple(
                (src._model_frame_slices, src._model_slices)
                for src in self.sources
            )
        else:
            slices = tuple(
                overlapped_slices(frame.bbox, src.bbox)
                for src in self.sources
            )
        full_model = jnp.zeros(frame.shape, dtype=models[0].dtype)
        for model, (fslice, mslice) in zip(models, slices):
            full_model = full_model.at[fslice].add(model[mslice])
        return full_model

    @property
    def log_likelihood(self):
        return -np.array(self.loss)

    # -- fitting ----------------------------------------------------------
    def _collect_parameters(self):
        X = list(self.parameters) + [
            p for obs in self.observations for p in obs.parameters
        ]
        free = [k for k, x in enumerate(X) if not x.fixed]
        return X, free

    def _make_step_fn(self, X, free, scheme, b1, b2, eps, p_pow,
                      prox_max_iter, noise_factor):
        """Build the jit-compiled update step over the free parameters.

        Returns ``(step, segment)``: ``step`` runs one iteration (loss at
        the incoming values, then the adaprox update); ``segment`` runs
        ``n`` such iterations as one compiled ``lax.scan`` with the
        convergence test (|dL| < e_rel |L|, blend.py:294-296) evaluated
        device-side so the host only syncs at segment boundaries."""
        n_model = len(self.parameters)
        fixed_vals = [None if k in free else x.value for k, x in enumerate(X)]
        steps = [x.step for x in X]
        proxes = [x.constraint for x in X]
        priors = [x.prior for x in X]

        def full_values(free_vals):
            vals = []
            i = 0
            for k in range(len(X)):
                if fixed_vals[k] is None:
                    vals.append(free_vals[i])
                    i += 1
                else:
                    vals.append(fixed_vals[k])
            return vals

        def neg_logL(free_vals, data_weights):
            vals = full_values(free_vals)
            model = self.get_model(*vals[:n_model], frame=self.frame)
            total = 0.0
            i = n_model
            for obs, (data, weights) in zip(self.observations, data_weights):
                n_obs = len(obs.parameters)
                obs_params = vals[i:i + n_obs]
                model_ = obs.renderer(model, *obs_params)
                total = total + obs.log_norm + \
                    jnp.sum(weights * (model_ - data) ** 2) / 2
                i += n_obs
            return total

        loss_grad = jax.value_and_grad(neg_logL)

        def _update(free_vals, opt_states, it, data_weights):
            loss, grads = loss_grad(free_vals, data_weights)
            new_vals = []
            new_states = []
            for i, k in enumerate(free):
                g = grads[i]
                if priors[k] is not None:
                    g = g - priors[k].grad(free_vals[i])
                s = steps[k]
                s_val = s(free_vals[i], it) if callable(s) else s
                prox = None
                if proxes[k] is not None:
                    prox = (lambda pk: lambda x, stp: pk(x, stp))(proxes[k])
                x_new, st_new = adaprox_step(
                    free_vals[i], g, it, opt_states[i], s_val, prox=prox,
                    scheme=scheme, b1=b1, b2=b2, eps=eps, p=p_pow,
                    max_prox_iter=prox_max_iter,
                )
                new_vals.append(x_new)
                new_states.append(st_new)
            return new_vals, new_states, loss

        step = jax.jit(_update)

        @partial(jax.jit, static_argnames=("n",))
        def segment(free_vals, opt_states, it0, data_weights, last_loss,
                    e_rel, min_iter, n):
            def body(carry, _):
                vals, opts, last, active, n_done = carry
                cur_it = it0 + n_done.astype(it0.dtype)
                new_vals, new_opts, loss = _update(vals, opts, cur_it,
                                                   data_weights)
                # the iteration that detects convergence is still applied
                # and recorded (blend.py:180-196 ordering: step -> append
                # loss -> callback raises StopIteration)
                vals = [jnp.where(active, nv, v)
                        for nv, v in zip(new_vals, vals)]
                opts = jax.tree.map(
                    lambda nv, v: jnp.where(active, nv, v), new_opts, opts)
                executed = active
                n_done = n_done + active.astype(n_done.dtype)
                converged = (it0 + n_done > min_iter) & (
                    jnp.abs(loss - last) < e_rel * jnp.abs(loss))
                last = jnp.where(active, loss, last)
                active = active & ~converged
                return (vals, opts, last, active, n_done), (loss, executed)

            init = (free_vals, opt_states, last_loss,
                    jnp.asarray(True), jnp.asarray(0, jnp.int32))
            carry, (losses, executed) = jax.lax.scan(body, init, None,
                                                     length=n)
            return carry, losses, executed

        return step, segment

    def fit(self, max_iter=200, e_rel=1e-3, min_iter=1, noise_factor=0,
            segment=10, **alg_kwargs):
        """Fit all free parameters.  Ref: scarlet/blend.py:85-198.

        ``segment`` iterations run as one compiled ``lax.scan`` between
        host syncs; the device-side convergence mask freezes updates the
        moment |dL| < e_rel |L| fires, so the iterate sequence is identical
        to per-iteration stepping (``segment=1``).  Host work — parameter
        write-back, finite checks, box-resize ``src.update()`` — happens at
        segment boundaries, which align with the reference's every-10-its
        update cadence (blend.py:283-289).  A per-iteration ``callback`` or
        ``noise_factor`` re-draws force ``segment=1``.

        Returns (n_iterations, final logL).
        """
        scheme = alg_kwargs.pop("scheme", "amsgrad")
        prox_max_iter = alg_kwargs.pop("prox_max_iter", 10)
        callback = alg_kwargs.pop("callback", None)
        b1 = alg_kwargs.pop("b1", 0.9)
        b2 = alg_kwargs.pop("b2", 0.999)
        eps = alg_kwargs.pop("eps", 1e-8)
        p_pow = alg_kwargs.pop("p", 0.25)
        self._noise_factor = noise_factor
        if callback is not None or noise_factor > 0:
            segment = 1
        # source updates fire at it % 10 == 0 — segments must not straddle
        # those boundaries
        segment = max(1, min(int(segment), 10))

        it = len(self.loss)
        # data/weights are fit-invariant without noise re-draws: upload
        # once, not once per resize restart (each jnp.asarray of the same
        # host array is a fresh transfer)
        fixed_weights = (self._data_weights(0) if noise_factor == 0
                         else None)
        while it < max_iter:
            X, free = self._collect_parameters()
            _, seg_fn = self._make_step_fn(X, free, scheme, b1, b2, eps,
                                           p_pow, prox_max_iter,
                                           noise_factor)

            free_vals = [X[k].value for k in free]
            opt_states = [
                init_adaprox_state(X[k].value, m=X[k].m, v=X[k].v,
                                   vhat=X[k].vhat)
                if X[k].m is not None and np.asarray(X[k].m).shape ==
                X[k].value.shape
                else init_adaprox_state(X[k].value)
                for k in free
            ]

            data_weights = (fixed_weights if fixed_weights is not None
                            else self._data_weights(noise_factor))

            try:
                while it < max_iter:
                    n = min(segment, max_iter - it,
                            (it // 10 + 1) * 10 - it)
                    (free_vals, opt_states, last_loss, active, n_done), \
                        losses, executed = seg_fn(
                            free_vals, opt_states, jnp.asarray(float(it)),
                            data_weights,
                            jnp.asarray(self.loss[-1]) if self.loss
                            else jnp.asarray(jnp.inf),
                            jnp.asarray(e_rel), jnp.asarray(min_iter), n)
                    # ONE bulk fetch per segment boundary: every host-side
                    # consumer below (loss bookkeeping, _sync write-back,
                    # check_parameters, src.update() box logic) then works
                    # on numpy with zero further device round trips — on a
                    # remote TPU the per-value eager fetches otherwise
                    # dominate the boundary (same dispatch-bound finding
                    # as parallel/stream.py stream_setup, r5)
                    free_vals, opt_states, losses, n_done, active = \
                        jax.device_get((free_vals, opt_states, losses,
                                        n_done, active))
                    n_exec = int(n_done)
                    self.loss.extend(np.asarray(losses[:n_exec]).tolist())
                    it += n_exec
                    if noise_factor > 0:
                        data_weights = self._data_weights(noise_factor)
                    self._sync(X, free, free_vals, opt_states)
                    self._callback(it, e_rel=e_rel, min_iter=min_iter,
                                   callback=callback,
                                   converged=not bool(active))
                break
            except StopIteration:
                break
            except UpdateException:
                # box resize: restart with warm moments at the new shapes
                continue

        # final sync + posterior std estimate (blend.py:188-192)
        X, free = self._collect_parameters()
        for k in free:
            x = X[k]
            if x.v is not None:
                v = np.asarray(x.v)
                with np.errstate(divide="ignore"):
                    x.std = np.where(v > 0, 1 / np.sqrt(np.where(v > 0, v, 1)),
                                     np.inf)
        logger.info(
            f"scarlet_tpu ran for {len(self.loss)} iterations to "
            f"logL = {self.log_likelihood[-1] if self.loss else np.nan}")
        return len(self.loss), (self.log_likelihood[-1] if self.loss
                                else np.nan)

    def _data_weights(self, noise_factor):
        out = []
        for obs in self.observations:
            data = obs.data
            weights = obs.weights
            if noise_factor > 0:
                rms = np.where(np.isfinite(obs.noise_rms), obs.noise_rms, 0.0)
                data = data + np.random.normal(loc=0, scale=rms)
                weights = weights / (noise_factor + 1)
            out.append((jnp.asarray(data), jnp.asarray(weights)))
        return tuple(out)

    def _sync(self, X, free, free_vals, opt_states):
        """Write updated values and moments back onto the Parameters."""
        for i, k in enumerate(free):
            X[k].value = free_vals[i]
            X[k].m = opt_states[i].m
            X[k].v = opt_states[i].v
            X[k].vhat = opt_states[i].vhat

    def _callback(self, it, e_rel=1e-3, min_iter=1, callback=None,
                  converged=None):
        """Finite check + periodic model update + convergence test.

        Ref: scarlet/blend.py:276-302.  The convergence test itself runs
        device-side inside the fit segment; ``converged`` reports it.
        """
        for src in self.sources:
            src.check_parameters()

        if it > 0 and it % 10 == 0:
            throw = False
            for src in self.sources:
                try:
                    src.update()
                except UpdateException:
                    throw = True
            if throw:
                raise UpdateException

        if converged is None:
            converged = it > min_iter and len(self.loss) >= 2 and \
                abs(self.loss[-1] - self.loss[-2]) < \
                e_rel * np.abs(self.loss[-1])
        if converged:
            raise StopIteration("scarlet_tpu.Blend.fit() converged")

        if callback is not None:
            callback(it=it)
