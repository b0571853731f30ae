"""Shared optimizer shapes for the experimental torch-analog models."""

import optax


def adam_l2(learning_rate: float, weight_decay: float):
    """torch ``Adam(weight_decay=...)`` semantics: L2 added to the GRADIENT
    before the moment update (not decoupled AdamW), with both hyperparams
    injectable so plateau schedules can rescale the lr without recompiling
    (used by NeuroMF/MultVAE, reference neuromf.py:302 / mult_vae.py:226).
    """

    def _chain(learning_rate, weight_decay):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(_chain)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
