"""Autoregressive models for neural-quantum-state workflows.

Counterpart of reference ``applications/van.py`` (MADE / PixelCNN used by
VQNHE): a flax MADE with masked dense layers; exposes log-prob and
autoregressive sampling, jit/vmap friendly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["MADE"]

try:
    import flax.linen as nn

    class MaskedDense(nn.Module):
        features: int
        mask: Any

        @nn.compact
        def __call__(self, x: Any) -> Any:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (x.shape[-1], self.features),
                jnp.float32,
            )
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            return x @ (kernel * jnp.asarray(self.mask, dtype=kernel.dtype)) + bias

    class MADE(nn.Module):
        """Masked autoencoder for distribution estimation over n binary spins."""

        n: int
        hidden: int = 64

        def setup(self) -> None:
            n, h = self.n, self.hidden
            # degrees: input i has degree i+1; hidden units cycle 1..n-1
            deg_in = np.arange(1, n + 1)
            deg_h = (np.arange(h) % max(n - 1, 1)) + 1
            mask1 = (deg_h[None, :] >= deg_in[:, None]).astype(np.float32)
            mask2 = (np.arange(1, n + 1)[None, :] > deg_h[:, None]).astype(np.float32)
            self.l1 = MaskedDense(features=h, mask=mask1)
            self.l2 = MaskedDense(features=n, mask=mask2)

        def logits(self, x: Any) -> Any:
            """Conditional logits p(x_i = 1 | x_<i>)."""
            h = jax.nn.relu(self.l1(x))
            return self.l2(h)

        def __call__(self, x: Any) -> Any:
            return self.log_prob(x)

        def log_prob(self, x: Any) -> Any:
            lg = self.logits(x)
            lp = -jax.nn.softplus(-lg) * x - jax.nn.softplus(lg) * (1 - x)
            return jnp.sum(lp, axis=-1)

        def sample(self, key: Any, batch: int) -> Any:
            x = jnp.zeros((batch, self.n))

            def body(i, carry):
                x, key = carry
                lg = self.logits(x)
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, (batch,))
                bit = (u < jax.nn.sigmoid(lg[:, i])).astype(x.dtype)
                x = x.at[:, i].set(bit)
                return x, key

            x, _ = jax.lax.fori_loop(0, self.n, body, (x, key))
            return x

except ImportError:  # pragma: no cover
    MADE = None  # type: ignore
