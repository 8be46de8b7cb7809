"""Training losses for the MoE model over padded batches.

``moe_loss`` reproduces the EM-style posterior-weighted mixture likelihood of
the reference (reference python/MixtureOfExpertsTools.py:111-229 ``MoELoss``):
per-allele expert Bernoulli probabilities weighted by a no-gradient posterior
over experts, with entropy regularisation (decaying per step), label
smoothing, optional per-expert auxiliary loss, and class weights.
``binary_loss`` is the BCE loss used for the no-ensemble binary classifier
(reference MixtureOfExpertsDNNFastDistributed.py:71-78).

Differences from the reference are purely structural: meta predictions are
expanded to allele slots via a site-id gather instead of repeat_interleave,
and every reduction is masked so padded slots contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def capped_log(x):
    """log with a 1e-10 cushion that is not applied near 1 to keep logs <= 0
    (reference MixtureOfExpertsTools.cappedLog:23-35)."""
    cushioned = x + 1e-10
    return jnp.log(jnp.where(cushioned > 1.0 - 1e-10, x, cushioned))


def posterior_probs(expert_probs, meta, labels):
    """EM posterior over experts given targets
    (reference getPosteriorProb:91-108).  All inputs allele-level [A, E]."""
    joint = expert_probs * meta + 1e-10
    return joint / jnp.sum(joint, axis=1, keepdims=True)


def moe_loss(expert_logits, meta, labels, site_ids, allele_mask,
             regularizer: float = 0.0,
             smoothing: float = 0.0,
             aux_weight: float = 0.0,
             class_weights=(1.0, 1.0),
             train: bool = True):
    """EM mixture-of-experts loss over one padded batch.

    expert_logits: [A, E]; meta: [S, E] softmaxed weights; labels: [A] in
    {0,1}; site_ids: [A]; allele_mask: [A].  ``regularizer`` is the *current*
    entropy coefficient — the caller owns the per-step decay that the
    reference keeps as module state (MoELoss.forward:162-165).

    Returns (total_loss, per_expert_loss [E], posterior [A, E]).
    """
    labels = labels.astype(jnp.float32)[:, None]          # [A, 1]
    mask = allele_mask.astype(jnp.float32)[:, None]       # [A, 1]
    weights = jnp.asarray(class_weights, jnp.float32)
    target_weights = weights[labels[:, 0].astype(jnp.int32)][:, None]

    meta_allele = meta[site_ids]                          # [A, E]
    # clamp away from {0, 1}: keeps the fused backward of the log terms finite
    # at saturated logits (the reference's 1e-10 log cushion plays this role
    # in eager torch; under XLA fusion the unclamped chain overflows)
    expert_preds = jnp.clip(jax.nn.sigmoid(expert_logits), 1e-7, 1.0 - 1e-7)

    # entropy regularisation over *site-level* meta predictions
    site_mask = jnp.zeros(meta.shape[0], jnp.float32).at[site_ids].max(
        allele_mask.astype(jnp.float32))
    meta_entropy = -jnp.sum(
        meta * capped_log(meta) * site_mask[:, None]) * regularizer

    if train and smoothing > 0:
        labels = labels + labels * (-smoothing) + (1 - labels) * smoothing

    expert_probs = labels * expert_preds + (1 - labels) * (1 - expert_preds)
    posterior = jax.lax.stop_gradient(
        posterior_probs(expert_probs, meta_allele, labels))

    total = jnp.sum(
        posterior * (capped_log(expert_probs) + capped_log(meta_allele))
        * target_weights * mask)
    if train:
        total = total + meta_entropy

    per_expert = jnp.sum(capped_log(expert_probs) * mask, axis=0)
    if train and aux_weight > 0:
        total = total + aux_weight * jnp.sum(per_expert) / expert_logits.shape[1]

    return -total, -per_expert, posterior


def binary_loss(expert_logits, labels, allele_mask):
    """Masked BCE for the binary-classifier (no-ensemble) model.

    Computed in logit space (max(x,0) - x*y + log1p(exp(-|x|))): the naive
    log(sigmoid) form overflows in the fused XLA backward at saturated logits.
    """
    labels = labels.astype(jnp.float32)
    mask = allele_mask.astype(jnp.float32)
    logits = expert_logits[:, 0]
    bce = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(bce * mask) / denom


def prediction_loss(expert_logits, meta, labels, site_ids, allele_mask):
    """Validation-style system likelihood (reference PredictionLoss:232-247)."""
    labels = labels.astype(jnp.float32)[:, None]
    mask = allele_mask.astype(jnp.float32)[:, None]
    meta_allele = meta[site_ids]
    preds = jax.nn.sigmoid(expert_logits)
    expert_probs = labels * preds + (1 - labels) * (1 - preds)
    system = jnp.sum(expert_probs * meta_allele, axis=1, keepdims=True)
    return -jnp.sum(capped_log(system) * mask)


def accuracy(expert_logits, meta, labels, site_ids, allele_mask):
    """Fraction of real allele slots classified correctly
    (reference Accuracy:250-262)."""
    labels = labels.astype(jnp.float32)
    mask = allele_mask.astype(jnp.float32)
    meta_allele = meta[site_ids]
    preds = jax.nn.sigmoid(expert_logits)
    mean_pred = jnp.sum(preds * meta_allele, axis=1)
    correct = ((mean_pred > 0.5) == (labels > 0.5)).astype(jnp.float32)
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
