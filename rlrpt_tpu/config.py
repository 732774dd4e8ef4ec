"""Runtime configuration system.

The reference configures everything through compile-time #define headers
(GPU_Rendering_Engine/Source/constants/{image,monte_carlo,radiance_volumes,
deep_learning}_settings.h) and requires a recompile to change scene/mode/
resolution.  Here the same knobs are plain frozen dataclasses, so every
renderer is parameterised at call time and presets per scene live in
`rlrpt_tpu.scene.presets`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

# Probability of sampling a given direction on the unit hemisphere under a
# uniform pdf (ref: image_settings.h:12 `#define RHO (1.f / (2.f*pi))`).
RHO = 1.0 / (2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Image + Monte-Carlo settings.

    ref: image_settings.h:7-10 (720x720, FOCAL_LENGTH = SCREEN_HEIGHT) and
    monte_carlo_settings.h:8-11 (80 bounces, 32 spp, env light 0,
    throughput threshold 1e-4).
    """

    width: int = 720
    height: int = 720
    focal_length: Optional[int] = None  # defaults to `height` like the ref
    samples_per_pixel: int = 32
    max_ray_bounces: int = 80
    environment_light: float = 0.0
    throughput_threshold: float = 1e-4
    # Surface offset applied to secondary-ray origins
    # (ref: default_path_tracing.cu:79 `position + 0.00001f * dir`).
    eps: float = 1e-5
    # Russian-roulette path termination (BASELINE.json config #3).  The
    # reference never terminates stochastically (paths die only on
    # miss / light hit / 80-bounce cap, monte_carlo_settings.h:8); RR is an
    # optional *unbiased* accelerator: from `rr_start_bounce` on, a
    # surviving path continues with probability
    # p = clip(max(throughput), rr_min_prob, 1) and its throughput is
    # divided by p, so E[estimate] is unchanged while deep low-energy
    # tails are cut.  Off by default for reference parity.
    russian_roulette: bool = False
    rr_start_bounce: int = 3
    rr_min_prob: float = 0.05
    # Ray-batch tile size for the intersection sweep; tiles are scanned so
    # peak memory is O(tile * n_triangles), MXU/VPU-aligned.
    ray_tile: int = 8192

    @property
    def focal(self) -> float:
        return float(self.focal_length if self.focal_length is not None else self.height)

    @property
    def n_pixels(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class RadianceVolumeConfig:
    """Tabular RL (expected SARSA) settings.

    ref: radiance_volumes_settings.h:9-23 — 12x12 hemisphere grid,
    one volume per 0.001 area, KD max dist 0.003, INITIAL_RADIANCE =
    100/144, RADIANCE_THRESHOLD = 0.8/144, DISTRIBUTION_THRESHOLD = 0.
    """

    grid_resolution: int = 12
    diameter: float = 0.15
    area_per_sample: float = 0.001
    max_dist: float = 0.003
    distribution_threshold: float = 0.0
    # Defensive importance sampling: blend `mix * uniform` into the
    # cos-weighted sector distribution at CDF rebuild (radiance.volumes.
    # rebuild_cdf).  0.0 == the reference's pure Q*cos CDF; > 0 bounds
    # importance weights on scenes with grazing-visibility emitters
    # (EVAL.json simple_room diagnosis).
    defensive_mix: float = 0.0
    max_volumes: Optional[int] = None  # cap (pad/truncate) for static shapes

    @property
    def n_sectors(self) -> int:
        return self.grid_resolution * self.grid_resolution

    @property
    def grid_rho(self) -> float:
        # ref: radiance_volumes_settings.h:11 `GRID_RHO = 1/144`
        return 1.0 / float(self.n_sectors)

    @property
    def initial_radiance(self) -> float:
        # ref: radiance_volumes_settings.h:16
        return (1.0 / float(self.n_sectors)) * 100.0

    @property
    def radiance_threshold(self) -> float:
        # ref: radiance_volumes_settings.h:17
        return (1.0 / float(self.n_sectors)) * 0.8


@dataclasses.dataclass(frozen=True)
class DeepLearningConfig:
    """Neural-Q settings.

    ref: deep_learning_settings.h:5-20 (eps-greedy consts, TRAIN_ON_POSITION)
    plus main.cu:116-124 (15 frames, 4096 ray batch) and dq_network.cu:14-17
    (layer sizes 200/300/200 -> n_actions, all ReLU incl. output).
    """

    epsilon_start: float = 0.05
    epsilon_min: float = 0.05
    epsilon_decay: float = 0.01
    train_on_position: bool = False
    batch_size: int = 4096
    hidden_sizes: tuple = (200, 300, 200)
    learning_rate: float = 0.001  # dynet AdamTrainer default
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # Reward scale for hitting an area light
    # (ref: neural_q_pathtracer.cu:697 `luminance * 200.f`).
    light_reward_scale: float = 200.0


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Offline supervised distillation settings.

    ref: NN_Q_Value_Trainer/Source/settings.cuh:4-5 (batch 128, 100 epochs)
    and main.cu:140-157 (80/20 split).
    """

    batch_size: int = 128
    epochs: int = 100
    train_fraction: float = 0.8
    learning_rate: float = 0.001


@dataclasses.dataclass(frozen=True)
class Config:
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    rl: RadianceVolumeConfig = dataclasses.field(default_factory=RadianceVolumeConfig)
    deep: DeepLearningConfig = dataclasses.field(default_factory=DeepLearningConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)


def small(width: int = 128, height: int = 128, spp: int = 4, bounces: int = 8) -> Config:
    """A small config for tests / CI."""
    return Config(render=RenderConfig(width=width, height=height,
                                      samples_per_pixel=spp,
                                      max_ray_bounces=bounces,
                                      ray_tile=4096))
