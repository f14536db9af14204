"""Convolutional-frontend RNN encoder (TPU-native Flax).

Capability parity with /root/reference/models/rnn.py: a stack of strided 2-D
convs over the [B, H, W] input image, then a multi-layer (optionally
bidirectional) RNN/LSTM/GRU over time, then a linear output layer.  The
recurrence runs as a `lax.scan`-based `nn.RNN` — sequential in W but with
batched matmuls on the MXU at every step.

Note: the reference divides the conv output height by the *pair* stride
(rnn.py:52 `h_out //= stride` with stride a list, a latent TypeError); the
intended height stride `stride[0]` is used here.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class RNN(nn.Module):
    input_size: int
    output_size: int
    cell_type: str
    hidden_size: int
    num_layers: int
    dropout: float = 0.0
    bidirectional: bool = False
    channels: Sequence[int] = (8, 8)
    kernel_sizes: Sequence[Sequence[int]] = ((5, 5), (5, 5))
    strides: Sequence[Sequence[int]] = ((2, 2), (2, 2))

    @property
    def time_stride(self):
        """Total downsampling along W (frames per output step)."""
        out = 1
        for s in self.strides:
            out *= s[1]
        return out

    @nn.compact
    def __call__(self, inputs, train=False):
        cell_type = self.cell_type.upper()
        if cell_type not in ["RNN", "LSTM", "GRU"]:
            raise ValueError(f"Unkown rnn cell type {self.cell_type}")

        # conv frontend: [B, H, W] -> [B, H', W', C]
        x = inputs[..., None]
        for out_channels, kernel, stride in zip(
            self.channels, self.kernel_sizes, self.strides
        ):
            kh, kw = kernel
            x = nn.Conv(
                features=out_channels,
                kernel_size=(kh, kw),
                strides=tuple(stride),
                padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            )(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # [B, H', W', C] -> [B, W', C*H'] (C major, matching torch
        # reshape(b, c*h, w).permute(0, 2, 1))
        B, H, W, C = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(B, W, C * H)

        def make_cell():
            if cell_type == "LSTM":
                return nn.OptimizedLSTMCell(self.hidden_size)
            if cell_type == "GRU":
                return nn.GRUCell(self.hidden_size)
            return nn.SimpleCell(self.hidden_size)

        for layer in range(self.num_layers):
            fwd = nn.RNN(make_cell())
            if self.bidirectional:
                bwd = nn.RNN(make_cell(), reverse=True, keep_order=True)
                x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            else:
                x = fwd(x)
            if self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        return nn.Dense(self.output_size)(x)
