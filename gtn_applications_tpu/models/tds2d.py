"""2-D time-depth-separable encoder and the WFST-conv transducer model
(TPU-native Flax).

Capability parity with /root/reference/models/tds2d.py.  All tensors are
feature-last (the XLA:TPU-native conv layout); the reference's Conv3d with
kernel (1, kh, kw) over [B, C, D, H, W] becomes a 3-D Conv with kernel
(kh, kw, 1) over [B, H, W, D, C] — identical math, MXU-friendly layout.
"""

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .tds import InstanceNorm
from ..ops.packed_conv import packing_factor, width_packed_conv


class PackedConv(nn.Module):
    """Drop-in nn.Conv replacement that width-packs output columns into
    the 128-lane MXU feature axis (ops/packed_conv.py; VERDICT r3 #1).

    Param tree is IDENTICAL to the nn.Conv it replaces (same names,
    shapes, and init), so packed and unpacked checkpoints are
    interchangeable.  ``depth_kernel`` mirrors the TDS block's 3-D
    (kh, kw, 1) kernel shape; the size-1 depth axis is squeezed before
    packing (the depth axis is folded into the batch by the caller)."""

    features: int
    kernel_size: Sequence[int]  # (kh, kw)
    strides: Sequence[int] = (1, 1)
    depth_kernel: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        shape = ((kh, kw, 1, c_in, self.features) if self.depth_kernel
                 else (kh, kw, c_in, self.features))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.depth_kernel:
            kernel = kernel.reshape(kh, kw, c_in, self.features)
        cd = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        f = packing_factor(self.features)
        y = width_packed_conv(
            x.astype(cd), kernel.astype(cd), tuple(self.strides), f)
        return y + bias.astype(cd)


class DimNumsConv(nn.Module):
    """The TDS block's depth-shared conv with C contracted IN PLACE:
    input [B, H, W, C, D] (feature axis 3, D a size-1-kernel spatial
    axis), so neither input nor output needs a transpose — the [C, D]
    split/merge against the flat CD axis is a free minor-dim reshape.
    Same kernel tensor ((kh, kw, 1, C, C)) and param names as the flax
    nn.Conv it replaces."""

    features: int
    kernel_size: Sequence[int]  # (kh, kw)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        kh, kw = self.kernel_size
        C = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, 1, C, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        cd = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        y = lax.conv_general_dilated(
            x.astype(cd), kernel.astype(cd),
            window_strides=(1, 1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
            dimension_numbers=("NHWCD", "HWDIO", "NHWCD"),
        )
        return y + bias.astype(cd)[None, None, None, :, None]


class TDSBlock2d(nn.Module):
    """2-D TDS block (tds2d.py:17-58) in [B, H, W, C*D] layout."""

    in_channels: int
    img_depth: int
    kernel_size: Sequence[int]
    dropout: float
    dtype: Any = None
    lane_pack: bool = False
    conv_layout: str = "transpose"  # "transpose" | "dimnums"

    @nn.compact
    def __call__(self, x, train=False):
        B, H, W, CD = x.shape
        C, D = self.in_channels, self.img_depth
        kh, kw = self.kernel_size
        cd_layout = self.conv_layout == "dimnums" and not self.lane_pack
        if cd_layout:
            # transpose-free: contract C in place ([B,H,W,C,D] feature at
            # axis 3, D a size-1-kernel spatial axis) — the CD split is a
            # free minor-dim reshape, so no data movement enters the
            # graph.  Same kernel tensor and param tree as the flax path;
            # the residual/reshape below consumes [B,H,W,C,D] directly.
            y = DimNumsConv(
                features=C, kernel_size=(kh, kw), dtype=self.dtype,
                name="Conv_0",
            )(x.reshape(B, H, W, C, D))
        elif self.lane_pack and C < 128:
            # fold depth into batch, pack output columns into MXU lanes
            y = x.reshape(B, H, W, C, D).transpose(0, 4, 1, 2, 3)
            y = y.reshape(B * D, H, W, C)
            y = PackedConv(
                features=C, kernel_size=(kh, kw), depth_kernel=True,
                dtype=self.dtype, name="Conv_0",
            )(y)
            # [B,D,H,W,C] -> [B,H,W,D,C], same layout the 3-D conv emits
            y = y.reshape(B, D, H, W, C).transpose(0, 2, 3, 1, 4)
        else:
            # torch views [B, CD, H, W] as [B, C, D, H, W] (C major); here:
            y = x.reshape(B, H, W, C, D).transpose(0, 1, 2, 4, 3)  # [B,H,W,D,C]
            y = nn.Conv(
                features=C,
                kernel_size=(kh, kw, 1),
                padding=((kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
                dtype=self.dtype,
                name="Conv_0",
            )(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        if cd_layout:
            y = y.reshape(B, H, W, CD)  # [B,H,W,C,D]: CD split is minor
        else:
            y = y.transpose(0, 1, 2, 4, 3).reshape(B, H, W, CD)
        x = y + x
        x = InstanceNorm(features=CD, axes=(1, 2))(x)

        y = nn.Dense(CD, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(CD, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = y + x
        x = InstanceNorm(features=CD, axes=(1, 2))(x)
        return x


class TDS2d(nn.Module):
    """TDS2d encoder (tds2d.py:61-116): [B, H, W] -> [B, W, output_size]."""

    input_size: int
    output_size: int
    depth: int
    tds_groups: Sequence[Dict[str, Any]]
    kernel_size: Sequence[int]
    dropout: float
    in_channels: int = 1
    dtype: Any = None  # compute dtype, e.g. jnp.bfloat16 (params stay fp32)
    lane_pack: bool = False  # width-pack small-channel convs onto MXU lanes
    conv_layout: str = "transpose"  # block conv: "transpose" | "dimnums"

    @property
    def time_stride(self):
        """Total downsampling along W (frames per output step)."""
        return int(np.prod([g["stride"][1] for g in self.tds_groups]))

    @nn.compact
    def __call__(self, inputs, train=False):
        B, H, W = inputs.shape
        stride_h = int(np.prod([grp["stride"][0] for grp in self.tds_groups]))
        if self.input_size % stride_h != 0:
            raise ValueError(
                f"Image height not divisible by total stride {stride_h}."
            )
        kh, kw = self.kernel_size
        # torch reshape [B, C_in, H//C_in, W] (C_in major) -> feature-last
        c_in = self.in_channels
        x = inputs.reshape(B, c_in, H // c_in, W).transpose(0, 2, 3, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for gi, tds_group in enumerate(self.tds_groups):
            out_channels = self.depth * tds_group["channels"]
            if self.lane_pack and out_channels < 128:
                x = PackedConv(
                    features=out_channels,
                    kernel_size=(kh, kw),
                    strides=tuple(tds_group["stride"]),
                    dtype=self.dtype,
                    name=f"Conv_{gi}",
                )(x)
            else:
                x = nn.Conv(
                    features=out_channels,
                    kernel_size=(kh, kw),
                    strides=tuple(tds_group["stride"]),
                    padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                    dtype=self.dtype,
                    name=f"Conv_{gi}",
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = InstanceNorm(features=out_channels, axes=(1, 2))(x)
            for _ in range(tds_group["num_blocks"]):
                x = TDSBlock2d(
                    tds_group["channels"], self.depth, self.kernel_size,
                    self.dropout, dtype=self.dtype, lane_pack=self.lane_pack,
                    conv_layout=self.conv_layout,
                )(x, train=train)
        # [B, H', W', C] -> [B, W', C*H'] (C major, matching torch
        # reshape(B, C*H, W)) -> Dense
        B2, H2, W2, C2 = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(B2, W2, C2 * H2)
        # logits in fp32 for the lattice criteria
        return nn.Dense(self.output_size)(x.astype(jnp.float32))


class TDS2dTransducer(nn.Module):
    """TDS2d -> ConvTransduce1D (or plain Conv1d control) -> Linear -> TDS2d
    (tds2d.py:119-181).

    ``tokens`` is the path to the wordpiece token list; the inner lexicon
    maps each output token to its grapheme index tuple.  Extra kwargs for
    the WFST conv layer arrive via ``conv_kwargs``.
    """

    input_size: int
    output_size: int
    tokens: str
    kernel_size: int
    stride: int
    tds1: Dict[str, Any]
    tds2: Dict[str, Any]
    wfst: bool = True
    conv_kwargs: Dict[str, Any] = None

    @property
    def time_stride(self):
        s1 = int(np.prod([g["stride"][1] for g in self.tds1["tds_groups"]]))
        s2 = int(np.prod([g["stride"][1] for g in self.tds2["tds_groups"]]))
        return s1 * self.stride * s2

    def setup(self):
        with open(self.tokens, "r") as fid:
            output_tokens = [l.strip() for l in fid]
        input_tokens = sorted(set(t for token in output_tokens for t in token))
        input_tokens = {t: e for e, t in enumerate(input_tokens)}
        lexicon = [
            tuple(input_tokens[t] for t in token) for token in output_tokens
        ]
        in_token_size = len(input_tokens) + 1
        blank_idx = len(input_tokens)
        self._lexicon_size = len(lexicon)

        self.tds1_mod = TDS2d(
            input_size=self.input_size, output_size=in_token_size, **self.tds1
        )
        stride_h = int(np.prod([g["stride"][0] for g in self.tds1["tds_groups"]]))
        inner_size = self.input_size // stride_h

        if self.wfst:
            from ..criterions.transducer import ConvTransduce1D

            kwargs = dict(self.conv_kwargs or {})
            self._conv = ConvTransduce1D(
                lexicon, self.kernel_size, self.stride, blank_idx, **kwargs
            )
            if self._conv.learn_params:
                self.kernel_params = self.param(
                    "kernel_params",
                    nn.initializers.zeros,
                    (self._conv.tables.num_params,),
                )
            else:
                self.kernel_params = None
        else:
            self.conv1d = nn.Conv(
                features=len(lexicon),
                kernel_size=(self.kernel_size,),
                strides=(self.stride,),
                padding=((self.kernel_size // 2, self.kernel_size // 2),),
            )

        in_channels = self.tds1["tds_groups"][-1]["channels"] * self.tds1["depth"]
        tds2 = dict(self.tds2)
        tds2["in_channels"] = in_channels
        self.linear = nn.Dense(in_channels * inner_size)
        self.tds2_mod = TDS2d(
            input_size=inner_size, output_size=self.output_size, **tds2
        )

    def __call__(self, inputs, train=False):
        x = self.tds1_mod(inputs, train=train)  # [B, W, C]
        if self.wfst:
            x = self._conv(x, self.kernel_params)
        else:
            x = self.conv1d(x)
        x = self.linear(x)  # [B, W', in_channels * inner_size]
        # feed tds2 as an image: [B, H=in_ch*inner, W']
        return self.tds2_mod(x.transpose(0, 2, 1), train=train)
