"""Losses: REINFORCE with learned baselines, entropy bonuses, masked
multi-step averaging, NLL classification, baseline MSE regression.

Parity targets (reference model.py:571-577 and 879-988):

* ``get_rec_outp`` — select each example's prediction at the step it
  stopped via the y-mask, plus per-step prediction negentropy.
* ``calculate_loss_binary`` — per-message REINFORCE loss
  ``mean(-(R - b)/max(1, std) * log p(z))`` with a *two-sided* entropy
  bonus (both ``p log p`` and ``(1-p) log(1-p)``, model.py:918-923).
* ``multistep_loss_binary`` — per-step losses combined with mask-count
  weighting: ``sum_t loss_t * n_t / sum_t n_t`` (model.py:956-961).
* ``calculate_loss_bas``/``multistep_loss_bas`` — MSE regression of
  baseline scores onto the (detached) log-likelihood reward.
* ``loglikelihood`` — per-example reward ``log p(target)``.

All functions take dense stacked ``(T, B, ...)`` arrays with ``(T, B, 1)``
masks instead of the reference's ragged Python lists; steps after a virtual
early break have all-zero masks and contribute exactly zero to both the
numerator and denominator (see game/masks.py).

Documented deviation: the reference normalizes the REINFORCE advantage by
``max(1, std)`` where ``std`` is torch's *unbiased* std over the masked
subset; for a one-example subset torch yields NaN (latent reference bug,
unreachable there only because break_early trims zero-mask steps). Here a
one-or-fewer-element subset yields std 0, i.e. no normalization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-8
stop_grad = jax.lax.stop_gradient


def loglikelihood(log_prob: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-example log-likelihood ``log_prob[b, target[b]]`` -> (B, 1)
    (reference model.py:571-577)."""
    return jnp.take_along_axis(log_prob, target.reshape(-1, 1), axis=1)


def get_rec_outp(y: jnp.ndarray, y_masks: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked prediction selection + per-step negentropy
    (reference model.py:879-904).

    Args:
        y: per-step class scores ``(T, B, D)``.
        y_masks: ``(T, B, 1)`` one-hot-over-T selection masks, or ``None``
            for fixed exchanges (-> last step's predictions).

    Returns ``(outp (B, D), negentropy (T,))``. The negentropy is the
    batch-mean ``sum_d p log p`` per step, computed over the *full* batch
    regardless of masks — replicating the reference's acknowledged
    approximation (model.py:884-886 TODO).
    """
    probs = jax.nn.softmax(y, axis=-1)
    negent = jnp.mean(jnp.sum(jnp.log(probs + EPS) * probs, axis=-1), axis=-1)
    if y_masks is None:
        return y[-1], negent
    outp = jnp.sum(y * stop_grad(y_masks), axis=0)
    return outp, negent


def _masked_unbiased_std(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Unbiased (N-1) std over rows where ``m == 1``; 0 when fewer than two
    rows are selected."""
    n = jnp.sum(m)
    mean = jnp.sum(x * m) / jnp.maximum(n, 1.0)
    var = jnp.sum(m * (x - mean) ** 2) / jnp.maximum(n - 1.0, 1.0)
    return jnp.where(n > 1, jnp.sqrt(var), 0.0)


def calculate_loss_binary(binary_features: jnp.ndarray,
                          binary_probs: jnp.ndarray,
                          logs: jnp.ndarray,
                          baseline_scores: jnp.ndarray,
                          entropy_penalty: Optional[float],
                          mask: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-step REINFORCE loss + two-sided negentropy
    (reference model.py:907-927; masked form folds in the row selection of
    ``multistep_loss_binary``'s mapped_fn, model.py:932-945).

    Gradients flow only through ``binary_probs``: features, rewards, and
    baseline scores are all detached (model.py:908-913).
    """
    feats = stop_grad(binary_features)
    log_p_z = jnp.sum(
        feats * jnp.log(binary_probs + EPS)
        + (1.0 - feats) * jnp.log(1.0 - binary_probs + EPS), axis=-1)  # (B,)
    weight = stop_grad(logs - baseline_scores)[:, 0]                   # (B,)
    batch = binary_features.shape[0]

    p = binary_probs
    per_row_negent = (jnp.sum(jnp.log(p + EPS) * p, axis=-1)
                      + jnp.sum(jnp.log((1.0 - p) + EPS) * (1.0 - p),
                                axis=-1))

    if mask is None:
        if batch > 1:  # reference guard ``logs.size(0) > 1`` (model.py:914)
            weight = weight / jnp.maximum(1.0, jnp.std(weight, ddof=1))
        loss = jnp.mean(-weight * log_p_z)
        negentropy = jnp.mean(per_row_negent)
        if entropy_penalty is not None:
            loss = loss + entropy_penalty * negentropy
        return loss, negentropy

    m = mask[:, 0]
    n = jnp.sum(m)
    denom = jnp.maximum(n, 1.0)
    if batch > 1:
        weight = weight / jnp.maximum(1.0, _masked_unbiased_std(weight, m))
    loss = jnp.sum(m * (-weight * log_p_z)) / denom
    negentropy = jnp.sum(m * per_row_negent) / denom
    if entropy_penalty is not None:
        loss = loss + entropy_penalty * negentropy
    # Zero-mask steps contribute exactly zero (reference mapped_fn early
    # return, model.py:933-934).
    loss = jnp.where(n > 0, loss, 0.0)
    negentropy = jnp.where(n > 0, negentropy, 0.0)
    return loss, negentropy


def multistep_loss_binary(binary_features: jnp.ndarray,
                          binary_probs: jnp.ndarray,
                          logs: jnp.ndarray,
                          baseline_scores: jnp.ndarray,
                          masks: Optional[jnp.ndarray],
                          entropy_penalty: Optional[float]
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask-weighted combination of per-step REINFORCE losses
    (reference model.py:930-968).

    Args are stacked ``(T', B, ...)``; ``masks`` is ``(T', B, 1)`` or
    ``None`` (fixed exchange -> simple mean over steps). Returns
    ``(loss, per_step_negentropies (T',))``.
    """
    if masks is not None:
        step_fn = lambda f, p, s, m: calculate_loss_binary(
            f, p, logs, s, entropy_penalty, m)
        losses, negents = jax.vmap(step_fn)(
            binary_features, binary_probs, baseline_scores, masks)
        mask_sums = jnp.sum(masks, axis=(1, 2))
        loss = (jnp.sum(losses * mask_sums)
                / jnp.maximum(jnp.sum(mask_sums), 1.0))
        return loss, negents
    step_fn = lambda f, p, s: calculate_loss_binary(
        f, p, logs, s, entropy_penalty, None)
    losses, negents = jax.vmap(step_fn)(
        binary_features, binary_probs, baseline_scores)
    return jnp.sum(losses) / binary_features.shape[0], negents


def calculate_loss_bas(baseline_scores: jnp.ndarray, logs: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """MSE regression of baseline scores onto detached rewards
    (reference model.py:971-973)."""
    sq = (baseline_scores - stop_grad(logs)) ** 2  # (B, 1)
    if mask is None:
        return jnp.mean(sq)
    n = jnp.sum(mask)
    return jnp.where(n > 0, jnp.sum(sq * mask) / jnp.maximum(n, 1.0), 0.0)


def multistep_loss_bas(baseline_scores: jnp.ndarray, logs: jnp.ndarray,
                       masks: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mask-weighted multi-step baseline loss (reference model.py:976-988)."""
    if masks is not None:
        losses = jax.vmap(
            lambda s, m: calculate_loss_bas(s, logs, m))(
            baseline_scores, masks)
        mask_sums = jnp.sum(masks, axis=(1, 2))
        return (jnp.sum(losses * mask_sums)
                / jnp.maximum(jnp.sum(mask_sums), 1.0))
    losses = jax.vmap(lambda s: calculate_loss_bas(s, logs))(baseline_scores)
    return jnp.sum(losses) / baseline_scores.shape[0]


def nll_loss(log_probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood — ``nn.NLLLoss`` on log-softmax scores
    (reference model.py:1271)."""
    return -jnp.mean(loglikelihood(log_probs, target))


def topk_accuracy(dist: jnp.ndarray, target: jnp.ndarray, k: int,
                  denom: int) -> jnp.ndarray:
    """Top-k accuracy (reference model.py:1332-1338): count targets
    appearing in the k highest-scoring classes, divided by the
    *configured* batch size (``denom``), which the reference also uses
    for truncated final eval batches (model.py:667).

    Uses rank counting (target is a top-k member iff fewer than k
    classes score strictly higher) rather than the reference's full
    argsort or a ``lax.top_k`` selection — same membership on any
    tie-free scores (exact ties need bit-equal class scores, i.e.
    duplicate description rows), one broadcast-compare-reduce instead of
    a sort, and, unlike XLA's TopK custom-call, fully partitionable: on
    a sharded batch the metric computes shard-locally instead of forcing
    an all-gather of the distributions (tests/test_hlo_collectives.py).
    ``k`` is clamped to the class count like the reference's argsort
    slice (``[:, -k:]`` on fewer than k columns keeps them all)."""
    k_eff = min(k, dist.shape[-1])
    tscore = jnp.take_along_axis(dist, target.reshape(-1, 1), axis=-1)
    rank = jnp.sum(dist > tscore, axis=-1)
    hits = jnp.sum(rank < k_eff)
    return hits / denom
