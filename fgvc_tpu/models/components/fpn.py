"""FPN neck — flax re-design of the reference neck
(/root/reference/mmpt/models/components/necks/fpn.py:35-242).

Capability parity: start/end level selection, extra output levels via
max-pool or extra stride-2 convs sourced from input/lateral/output,
optional relu before extra convs, nearest top-down upsampling.
Layout: NHWC tensors; no norm/act inside ConvModules (the reference's
shipped default: conv_cfg=None, norm_cfg=None, act_cfg=None).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    in_channels: Tuple[int, ...]
    out_channels: int
    num_outs: int
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False  # False | 'on_input' |
    #                                           'on_lateral' | 'on_output'
    relu_before_extra_convs: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        assert len(inputs) == len(self.in_channels)
        end = (
            len(self.in_channels) if self.end_level == -1 else self.end_level
        )
        extra_mode = self.add_extra_convs
        if extra_mode is True:
            extra_mode = "on_output"

        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(
                inputs[i + self.start_level]
            )
            for i in range(end - self.start_level)
        ]

        # top-down pathway (nearest upsample to the finer level's size)
        for i in range(len(laterals) - 1, 0, -1):
            tgt = laterals[i - 1].shape
            laterals[i - 1] = laterals[i - 1] + jax.image.resize(
                laterals[i], tgt[:-1] + (self.out_channels,), method="nearest"
            )

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"fpn{i}")(
                laterals[i]
            )
            for i in range(len(laterals))
        ]

        n_used = len(outs)
        if self.num_outs > n_used:
            if not extra_mode:
                for _ in range(self.num_outs - n_used):
                    x = outs[-1]
                    outs.append(
                        nn.max_pool(
                            x, window_shape=(1, 1), strides=(2, 2)
                        )
                    )
            else:
                if extra_mode == "on_input":
                    src = inputs[end - 1]
                elif extra_mode == "on_lateral":
                    src = laterals[-1]
                else:
                    src = outs[-1]
                outs.append(
                    nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2), padding=1,
                        name=f"fpn{n_used}",
                    )(src)
                )
                for i in range(n_used + 1, self.num_outs):
                    x = outs[-1]
                    if self.relu_before_extra_convs:
                        x = nn.relu(x)
                    outs.append(
                        nn.Conv(
                            self.out_channels, (3, 3), strides=(2, 2),
                            padding=1, name=f"fpn{i}",
                        )(x)
                    )
        return tuple(outs)
