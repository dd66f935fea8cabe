"""Contrastive / unsupervised losses (research utilities).

Parity targets (present but unused by the reference drivers):
  * ``ContrastiveLoss`` — SimCLR NT-Xent over flattened embeddings
    (``semseg/val.py:259-297``);
  * ``ce_unsup`` — cross-entropy over an embedding-similarity matrix with
    optional targeted variants (``semseg/val.py:300-326``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def nt_xent_loss(emb_i: Array, emb_j: Array, temperature: float = 1.0
                 ) -> Array:
    """SimCLR NT-Xent between two batches of paired embeddings.

    Parity: ``val.py:269-297`` — cosine-similarity matrix over the 2B
    concatenated L2-normalized embeddings, positives on the +-B diagonals.
    """
    b = emb_i.shape[0]
    zi = emb_i.reshape(b, -1)
    zj = emb_j.reshape(b, -1)
    zi = zi / jnp.linalg.norm(zi, axis=1, keepdims=True)
    zj = zj / jnp.linalg.norm(zj, axis=1, keepdims=True)
    reps = jnp.concatenate([zi, zj], axis=0)                 # (2B, D)
    sim = reps @ reps.T                                      # cosine (unit)
    pos = jnp.concatenate([jnp.diagonal(sim, offset=b),
                           jnp.diagonal(sim, offset=-b)])
    neg_mask = 1.0 - jnp.eye(2 * b, dtype=sim.dtype)
    nominator = jnp.exp(pos / temperature)
    denominator = (neg_mask * jnp.exp(sim / temperature)).sum(axis=1)
    return (-jnp.log(nominator / denominator)).sum() / (2 * b)


def ce_unsup(out: Array, targets: Array, reduction: str = "mean",
             targeted: bool = False, alpha: float = 0.0) -> Array:
    """CE over out @ targets^T with identity (or shifted/argmax) labels.

    Parity: ``val.py:300-326``.
    """
    out = out.reshape(out.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    b = out.shape[0]
    preds = out @ targets.T
    labels = jnp.arange(b)
    if targeted:
        if alpha == 0.0:
            labels = (labels + 1) % b
        elif alpha == 1.0:
            labels = jnp.argmax(preds - 10.0 * jnp.diag(jnp.diagonal(preds)),
                                axis=1)
        else:
            raise ValueError(f"alpha={alpha} not supported")
    logp = jax.nn.log_softmax(preds, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    loss = nll.mean() if reduction == "mean" else nll
    return -loss if targeted else loss
