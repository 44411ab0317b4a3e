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


# ======================================================================
# reference-parity autoregressive models (applications/van.py:57-400)
# ======================================================================

try:
    import flax.linen as _fnn

    MaskedLinear = MaskedDense  # reference name for the masked dense layer

    class MaskedConv2D(_fnn.Module):
        """Autoregressive 2D convolution, mask type "A" (strict) or "B".

        Reference ``van.py:238`` (TF); pixels see only earlier pixels in
        raster order — the PixelCNN building block.
        """

        mask_type: str
        features: int
        kernel_size: int = 3

        @_fnn.compact
        def __call__(self, x: Any) -> Any:
            assert self.mask_type in ("A", "B")
            k = self.kernel_size
            in_feat = x.shape[-1]
            kernel = self.param(
                "kernel",
                _fnn.initializers.lecun_normal(),
                (k, k, in_feat, self.features),
                jnp.float32,
            )
            bias = self.param("bias", _fnn.initializers.zeros, (self.features,), jnp.float32)
            mask = np.ones((k, k, 1, 1), dtype=np.float32)
            c = k // 2
            mask[c, c + (1 if self.mask_type == "B" else 0) :, :, :] = 0.0
            mask[c + 1 :, :, :, :] = 0.0
            y = jax.lax.conv_general_dilated(
                x,
                kernel * jnp.asarray(mask),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias

    class ResidualBlock(_fnn.Module):
        """y = x + layers(x) (reference ``van.py:265``)."""

        layers: Any

        @_fnn.compact
        def __call__(self, x: Any) -> Any:
            y = x
            for layer in self.layers:
                y = layer(y) if not isinstance(layer, str) else jax.nn.relu(y)
            return y + x

    class PixelCNN(_fnn.Module):
        """Autoregressive PixelCNN over a 2D spin lattice (reference :277).

        ``__call__(x[N,H,W,C_in]) -> logits[N,H,W,spin_channel]``; joint
        log-prob and raster-order sampling included.
        """

        spin_channel: int
        depth: int
        filters: int

        def setup(self) -> None:
            self.first = MaskedConv2D(mask_type="A", features=self.filters)
            self.blocks = [
                ResidualBlock(
                    layers=[
                        MaskedConv2D(mask_type="B", features=self.filters),
                        "relu",
                    ]
                )
                for _ in range(max(self.depth - 1, 0))
            ]
            self.head = MaskedConv2D(mask_type="B", features=self.spin_channel)

        def __call__(self, x: Any) -> Any:
            y = jax.nn.relu(self.first(x))
            for blk in self.blocks:
                y = blk(y)
            return self.head(y)

        def log_prob(self, x: Any) -> Any:
            """x: [N,H,W] integer spins in [0, spin_channel)."""
            onehot = jax.nn.one_hot(x, self.spin_channel, dtype=jnp.float32)
            logits = self(onehot)
            lp = jax.nn.log_softmax(logits, axis=-1)
            sel = jnp.take_along_axis(lp, x[..., None].astype(jnp.int32), axis=-1)[..., 0]
            return jnp.sum(sel, axis=(-1, -2))

        def sample(self, key: Any, batch: int, h: int, w: int) -> Any:
            x = jnp.zeros((batch, h, w), dtype=jnp.int32)
            for i in range(h):
                for j in range(w):
                    onehot = jax.nn.one_hot(x, self.spin_channel, dtype=jnp.float32)
                    logits = self(onehot)[:, i, j]
                    key, sub = jax.random.split(key)
                    bit = jax.random.categorical(sub, logits)
                    x = x.at[:, i, j].set(bit)
            return x

    class NMF(_fnn.Module):
        """Naive-mean-field factorized distribution (reference ``van.py:345``).

        Independent categorical per site with trainable logits; same
        log_prob/sample interface as MADE/PixelCNN.
        """

        spin_channel: int
        dimensions: Any  # tuple of lattice dims

        @_fnn.compact
        def _logits(self) -> Any:
            return self.param(
                "meanfield-parameter",
                _fnn.initializers.normal(1.0),
                tuple(self.dimensions) + (self.spin_channel,),
                jnp.float32,
            )

        def __call__(self, x: Any) -> Any:
            return self.log_prob(x)

        def log_prob(self, x: Any) -> Any:
            lp = jax.nn.log_softmax(self._logits(), axis=-1)
            sel = jnp.take_along_axis(
                jnp.broadcast_to(lp, x.shape + (self.spin_channel,)),
                x[..., None].astype(jnp.int32),
                axis=-1,
            )[..., 0]
            axes = tuple(range(1, sel.ndim))
            return jnp.sum(sel, axis=axes)

        def sample(self, key: Any, batch: int) -> Any:
            logits = self._logits()
            flat = jnp.reshape(logits, (-1, self.spin_channel))
            keys = jax.random.split(key, flat.shape[0])
            cols = [
                jax.random.categorical(keys[i], flat[i], shape=(batch,))
                for i in range(flat.shape[0])
            ]
            x = jnp.stack(cols, axis=1)
            return jnp.reshape(x, (batch,) + tuple(self.dimensions))

    __all__ += ["MaskedLinear", "MaskedConv2D", "ResidualBlock", "PixelCNN", "NMF"]
except ImportError:  # pragma: no cover
    MaskedLinear = MaskedConv2D = ResidualBlock = PixelCNN = NMF = None  # type: ignore


# -- TF-era method aliases on the flax modules (reference surface) --

def _l2_regularization(params: Any, lbd_w: float = 0.01, lbd_b: float = 0.01) -> Any:
    leaves = jax.tree_util.tree_leaves_with_path(params)
    reg = 0.0
    for path, leaf in leaves:
        name = str(path[-1]) if path else ""
        lbd = lbd_b if "bias" in name else lbd_w
        reg = reg + lbd * jnp.sum(jnp.asarray(leaf) ** 2)
    return reg


if MADE is not None:
    def _made_call(self, x):
        return self.__call__(x)

    def _made_model(self):
        """Self-reference for TF-era ``.model`` access (reference parity)."""
        return self

    def _made_regularization(self, params: Any = None, lbd_w: float = 0.01, lbd_b: float = 0.01) -> Any:
        """L2 penalty over kernels/biases (reference ``regularization``)."""
        if params is None:
            raise ValueError("flax modules are functional: pass params explicitly")
        return _l2_regularization(params, lbd_w, lbd_b)

    MADE.call = _made_call
    MADE.model = property(_made_model)
    MADE.regularization = _made_regularization
    MaskedDense.call = lambda self, x: self.__call__(x)
    MaskedDense.regularization = _made_regularization
    MaskedLinear = MaskedDense
    for _cls in (MaskedConv2D, ResidualBlock, PixelCNN, NMF):
        _cls.call = lambda self, x: self.__call__(x)
    MaskedConv2D.build = lambda self, shape=None: None  # keras-era no-op
