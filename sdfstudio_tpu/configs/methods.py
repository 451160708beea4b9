"""Method registry: named configurations with full hyperparameters.

Functional spec: reference nerfstudio/configs/method_configs.py:79-1172.
Hyperparameters mirror the reference entries line-for-line (sources cited
per method). Methods whose models are not yet ported raise at build time
with a clear message.
"""
from __future__ import annotations

from typing import Dict

from sdfstudio_tpu.cameras.camera_optimizers import CameraOptimizerConfig
from sdfstudio_tpu.configs.base import Config
from sdfstudio_tpu.data.datamanager import DataManagerConfig
from sdfstudio_tpu.data.dataparsers.sdfstudio import SDFStudioDataParserConfig, SDFStudio
from sdfstudio_tpu.engine.optimizers import (
    OptimizerConfig,
    OptimizerGroupConfig,
)
from sdfstudio_tpu.engine.schedulers import SchedulerConfig
from sdfstudio_tpu.engine.trainer import TrainerConfig
from sdfstudio_tpu.fields.sdf_field import SDFFieldConfig
from sdfstudio_tpu.models.bakedangelo import BakedAngeloModel, BakedAngeloModelConfig
from sdfstudio_tpu.models.bakedsdf import BakedSDFFactoModel, BakedSDFModelConfig
from sdfstudio_tpu.models.neuralangelo import NeuralangeloModel, NeuralangeloModelConfig
from sdfstudio_tpu.models.neus import NeuSModel, NeuSModelConfig
from sdfstudio_tpu.models.neus_facto import NeuSFactoModel, NeuSFactoModelConfig
from sdfstudio_tpu.models.unisurf import UniSurfModel, UniSurfModelConfig
from sdfstudio_tpu.models.volsdf import VolSDFModel, VolSDFModelConfig

method_configs: Dict[str, Config] = {}

descriptions = {
    "neus": "Implementation of NeuS.",
    "volsdf": "Implementation of VolSDF.",
    "monosdf": "Implementation of MonoSDF.",
    "mono-neus": "MonoSDF with NeuS rendering formulation.",
    "geo-neus": "Patch warping from Geo-NeuS with NeuS.",
    "geo-volsdf": "Patch warping from Geo-NeuS with VolSDF.",
    "unisurf": "Implementation of UniSurf.",
    "mono-unisurf": "MonoSDF with unisurf rendering formulation.",
    "geo-unisurf": "Patch warping from Geo-NeuS with UniSurf.",
    "neus-facto": "NeuS with proposal-network sampling (recommended).",
    "neus-facto-tpu": "neus-facto with a TPU-optimized hash layout (8x4).",
    "neus-facto-tpu-p4": "neus-facto-tpu with a permutohedral L4xF4 encoding.",
    "neus-facto-tpu-p8": "neus-facto-tpu with a permutohedral L8xF4 encoding.",
    "neus-facto-bigmlp": "NeuS-facto with a big MLP (heritage-scale).",
    "neus-facto-angelo": "Neuralangelo hash field with neus-facto sampling.",
    "neuralangelo": "Implementation of Neuralangelo.",
    "bakedsdf": "BakedSDF with multi-res hash grids.",
    "bakedsdf-mlp": "BakedSDF with large MLPs.",
    "bakedangelo": "Neuralangelo with BakedSDF.",
    "neus-acc": "NeuS with empty-space skipping.",
    "nerfacto": "Recommended density model for real captures.",
    "instant-ngp": "Occupancy-grid accelerated NeRF.",
    "vanilla-nerf": "Original NeRF.",
    "mipnerf": "Mip-NeRF (IPE) model.",
    "tensorf": "TensoRF model.",
}


def _adam(lr, eps=1e-15, weight_decay=0.0, kind="adam"):
    return OptimizerConfig(kind=kind, lr=lr, eps=eps, weight_decay=weight_decay)


def _neus_sched(warm_up_end=5000, alpha=0.05, max_steps=300000):
    return SchedulerConfig(
        kind="neus", warm_up_end=warm_up_end, learning_rate_alpha=alpha, max_steps=max_steps
    )


def _multistep(max_steps):
    return SchedulerConfig(kind="multistep", max_steps=max_steps)


def _multistep_warmup(warm_up_end, milestones, gamma=0.1):
    return SchedulerConfig(
        kind="multistep_warmup", warm_up_end=warm_up_end, milestones=tuple(milestones), gamma=gamma
    )


def _exp(decay_rate, max_steps):
    return SchedulerConfig(kind="exponential", decay_rate=decay_rate, max_steps=max_steps)


_SURFACE_TRAINER = dict(
    steps_per_eval_image=500,
    steps_per_eval_batch=5000,
    steps_per_save=20000,
    steps_per_eval_all_images=1000000,
    mixed_precision=False,
)


def _surface_cfg(name, model_cls, model_cfg, optimizers, trainer_kwargs, rays_per_batch=1024):
    return Config(
        method_name=name,
        trainer=TrainerConfig(**{**_SURFACE_TRAINER, **trainer_kwargs}),
        datamanager=DataManagerConfig(
            train_num_rays_per_batch=rays_per_batch,
            eval_num_rays_per_batch=1024,
            camera_optimizer=CameraOptimizerConfig(mode="off"),
        ),
        model=model_cfg,
        model_class=model_cls,
        dataparser=SDFStudioDataParserConfig(),
        dataparser_class=SDFStudio,
        optimizers=optimizers,
    )


# --- neus (method_configs.py:725-758) --------------------------------------
method_configs["neus"] = _surface_cfg(
    "neus",
    NeuSModel,
    NeuSModelConfig(eval_num_rays_per_chunk=1024),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
    },
    dict(max_num_iterations=100000),
)

# --- volsdf (method_configs.py:617-650) ------------------------------------
method_configs["volsdf"] = _surface_cfg(
    "volsdf",
    VolSDFModel,
    VolSDFModelConfig(eval_num_rays_per_chunk=1024),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _exp(0.1, 100000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _exp(0.1, 100000)),
    },
    dict(max_num_iterations=100000),
)

# --- monosdf (method_configs.py:581-615) -----------------------------------
method_configs["monosdf"] = _surface_cfg(
    "monosdf",
    VolSDFModel,
    VolSDFModelConfig(
        mono_depth_loss_mult=0.1, mono_normal_loss_mult=0.05, eval_num_rays_per_chunk=1024
    ),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _exp(0.1, 200000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _exp(0.1, 200000)),
    },
    dict(max_num_iterations=200000),
)
method_configs["monosdf"].dataparser = SDFStudioDataParserConfig(include_mono_prior=True)

# --- mono-neus (method_configs.py:688-722) ---------------------------------
method_configs["mono-neus"] = _surface_cfg(
    "mono-neus",
    NeuSModel,
    NeuSModelConfig(
        mono_depth_loss_mult=0.1, mono_normal_loss_mult=0.05, eval_num_rays_per_chunk=1024
    ),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
    },
    dict(max_num_iterations=100000),
)
method_configs["mono-neus"].dataparser = SDFStudioDataParserConfig(include_mono_prior=True)

# --- geo-neus / geo-volsdf (method_configs.py:544-579, 651-686) ------------
method_configs["geo-neus"] = _surface_cfg(
    "geo-neus",
    NeuSModel,
    NeuSModelConfig(patch_warp_loss_mult=0.1, eval_num_rays_per_chunk=1024),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
    },
    dict(max_num_iterations=200000),
)
method_configs["geo-neus"].dataparser = SDFStudioDataParserConfig(
    load_pairs=True, include_sfm_points=True
)

method_configs["geo-volsdf"] = _surface_cfg(
    "geo-volsdf",
    VolSDFModel,
    VolSDFModelConfig(patch_warp_loss_mult=0.1, eval_num_rays_per_chunk=1024),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _multistep(1000000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _exp(0.1, 200000)),
    },
    dict(max_num_iterations=200001),
)
method_configs["geo-volsdf"].dataparser = SDFStudioDataParserConfig(load_pairs=True)

# --- unisurf family (method_configs.py:760-860) ----------------------------
for _name, _mkw, _parser in (
    ("unisurf", {}, SDFStudioDataParserConfig()),
    (
        "mono-unisurf",
        dict(mono_depth_loss_mult=0.1, mono_normal_loss_mult=0.05),
        SDFStudioDataParserConfig(include_mono_prior=True),
    ),
    ("geo-unisurf", dict(patch_warp_loss_mult=0.1), SDFStudioDataParserConfig(load_pairs=True)),
):
    method_configs[_name] = _surface_cfg(
        _name,
        UniSurfModel,
        UniSurfModelConfig(eval_num_rays_per_chunk=1024, **_mkw),
        {
            "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
            "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched()),
        },
        dict(max_num_iterations=100000),
    )
    method_configs[_name].dataparser = _parser

# --- neus-facto (method_configs.py:452-501) --------------------------------
method_configs["neus-facto"] = _surface_cfg(
    "neus-facto",
    NeuSFactoModel,
    NeuSFactoModelConfig(
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=2,
            num_layers_color=2,
            hidden_dim=256,
            bias=0.5,
            beta_init=0.3,
            use_appearance_embedding=False,
            inside_outside=False,
        ),
        background_model="none",
        eval_num_rays_per_chunk=1024,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(20000)),
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
    },
    dict(max_num_iterations=20001, steps_per_eval_image=5000),
    rays_per_batch=2048,
)

# --- neus-facto-tpu: TPU-native access-count-minimized neus-facto ----------
# Same method as neus-facto, redesigned around the measured v5e primitive
# rates (probe_prims.py): random table gathers run ~190-300M rows/s and the
# sort-based gradient segment-add ~125M upd/s, while MXU matmuls are
# effectively free — so the preset spends capacity in MLPs and minimizes
# random-access count:
#   * proposal fields are gather-free PE+MLPs (mip-NeRF-360's original
#     proposal design; density_field.py field_type="mlp") — the hash
#     proposal stage was ~35M table rows/step;
#   * SDF hash grid: 8 levels x 4 features, 2^19 table — half the rows of
#     L16xF2 at double the per-row capacity. max_res 512: resolution IS
#     free on TPU speed-wise (step time is bound by gather ROW count,
#     levels x corners, not level resolution), but NOT free quality-wise
#     at L8 — the round-4 20k parity arms measured 512 BETTER than 2048
#     (PSNR 33.96 vs 33.75; the 2048 arm's finer top levels alias harder
#     into the same 2^19 rows). The earlier committed claim that the 512
#     cap caused the 0.06 dB miss was refuted by its own retrain.
#   * Round-5 capacity decision under the MEASURED seed-noise floor
#     (preset_candidates base512_s43: seed 42 vs 43 at 2k differ by
#     0.14 dB PSNR / ~2x Chamfer — individual <0.2 dB levers are not
#     resolvable by one short arm): stack the near-free capacity levers
#     instead of probing them one at a time. F2 -> F4 costs the measured
#     +46 ms/step (scatter-VJP sort payload; 237 vs 191 ms post-
#     searchsorted-fix) and proposal MLPs go 64 -> 128 hidden (~0.35 ms
#     of MXU). 2k evidence: l8xf4_512 PSNR 29.90 / Chamfer 0.0453 vs
#     base512 29.83-29.97 / 0.032-0.059 across seeds.
# Quality parity vs neus-facto is tracked on the synthetic DTU-like scene
# (PSNR + Chamfer at 20k iters; see BENCH notes / README).
method_configs["neus-facto-tpu"] = _surface_cfg(
    "neus-facto-tpu",
    NeuSFactoModel,
    NeuSFactoModelConfig(
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=2,
            num_layers_color=2,
            hidden_dim=256,
            bias=0.5,
            beta_init=0.3,
            use_appearance_embedding=False,
            inside_outside=False,
            num_levels=8,
            hash_features_per_level=4,
            max_res=512,
        ),
        proposal_net_args_list=(
            {"field_type": "mlp", "hidden_dim": 128, "max_res": 64},
            {"field_type": "mlp", "hidden_dim": 128, "max_res": 256},
        ),
        background_model="none",
        eval_num_rays_per_chunk=1024,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(20000)),
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
    },
    # steps_per_call=25: probe_scan_k verified K=16/25/40 compile+run for
    # this preset (the full neus-facto program faults at K>=16); larger K
    # amortizes the per-dispatch relay round trip further.
    dict(max_num_iterations=20001, steps_per_eval_image=5000, steps_per_call=25),
    rays_per_batch=2048,
)

# --- neus-facto-tpu-p4: the permutohedral step down the access-count lever -
# Same method again, with the SDF encoding switched to the permutohedral
# lattice (ops/permuto.py — 4 simplex corners per lookup vs trilinear's 8)
# at L4xF4: 16 gather rows/query vs the hash preset's 64/32. The round-4
# shootout measured it at 180 ms/step (11.4k rays/s in-loop at K=25) vs
# l4xf4's 202 ms; quality is gated by the same parity protocol before this
# method can carry the PARITY.json attestation (docs/tpu-design.md "90k
# feasibility" — this is the best structural point designed).
method_configs["neus-facto-tpu-p4"] = _surface_cfg(
    "neus-facto-tpu-p4",
    NeuSFactoModel,
    NeuSFactoModelConfig(
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=2,
            num_layers_color=2,
            hidden_dim=256,
            bias=0.5,
            beta_init=0.3,
            use_appearance_embedding=False,
            inside_outside=False,
            encoding_type="permuto",
            num_levels=4,
            hash_features_per_level=4,
            # 512 like the hash preset: the 20k arms measured 512 > 2048
            # at fixed table rows (see the neus-facto-tpu comment above)
            max_res=512,
        ),
        proposal_net_args_list=(
            {"field_type": "mlp", "hidden_dim": 64, "max_res": 64},
            {"field_type": "mlp", "hidden_dim": 64, "max_res": 256},
        ),
        background_model="none",
        eval_num_rays_per_chunk=1024,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(20000)),
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
    },
    # K=25 verified on TPU for this exact layout by the round-4 shootout
    # permuto arm (600 steps at steps_per_call=25 before a driver kill).
    dict(max_num_iterations=20001, steps_per_eval_image=5000, steps_per_call=25),
    rays_per_batch=2048,
)

# --- neus-facto-tpu-p8: permutohedral at the attested preset's capacity ----
# L8xF4 permuto = 32 gather rows/query (8 levels x 4 simplex corners) at
# the SAME 32 feature dims as the attested hash preset. Round-5 screening
# (preset_candidates "permuto_l8f4_512"): 168 ms/step (12.2k rays/s
# in-loop) with the BEST 2k PSNR of any candidate (30.05 vs hash arms'
# 29.83-29.97) but a persistent chamfer-accuracy excess (~0.128 at L4 and
# L8 alike — lattice-related spurious surface, not capacity). Registered
# so the parity protocol can train it by name; it carries the attestation
# only if it passes the full 20k protocol.
method_configs["neus-facto-tpu-p8"] = _surface_cfg(
    "neus-facto-tpu-p8",
    NeuSFactoModel,
    NeuSFactoModelConfig(
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=2,
            num_layers_color=2,
            hidden_dim=256,
            bias=0.5,
            beta_init=0.3,
            use_appearance_embedding=False,
            inside_outside=False,
            encoding_type="permuto",
            num_levels=8,
            hash_features_per_level=4,
            max_res=512,
        ),
        proposal_net_args_list=(
            {"field_type": "mlp", "hidden_dim": 128, "max_res": 64},
            {"field_type": "mlp", "hidden_dim": 128, "max_res": 256},
        ),
        background_model="none",
        eval_num_rays_per_chunk=1024,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(20000)),
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
    },
    dict(max_num_iterations=20001, steps_per_eval_image=5000, steps_per_call=25),
    rays_per_batch=2048,
)

# --- neus-facto-bigmlp (method_configs.py:503-542) -------------------------
method_configs["neus-facto-bigmlp"] = _surface_cfg(
    "neus-facto-bigmlp",
    NeuSFactoModel,
    NeuSFactoModelConfig(
        sdf_field=SDFFieldConfig(num_layers=8, hidden_dim=512, num_layers_color=4),
        eval_num_rays_per_chunk=1024,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(100000)),
        "field": OptimizerGroupConfig(_adam(1e-3), _neus_sched(500, 0.05, 100000)),
        "field_background": OptimizerGroupConfig(_adam(1e-2), _neus_sched(500, 0.05, 100000)),
    },
    dict(max_num_iterations=100001, steps_per_eval_image=5000),
    rays_per_batch=2048,
)

# --- neus-facto-angelo (method_configs.py:381-450) -------------------------
method_configs["neus-facto-angelo"] = _surface_cfg(
    "neus-facto-angelo",
    NeuSFactoModel,
    NeuSFactoModelConfig(
        near_plane=0.01,
        far_plane=1000.0,
        overwrite_near_far_plane=True,
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=1,
            num_layers_color=4,
            hidden_dim=256,
            hidden_dim_color=256,
            geometric_init=True,
            bias=0.5,
            beta_init=0.3,
            inside_outside=False,
            use_appearance_embedding=True,
            use_numerical_gradients=True,
            base_res=64,
            max_res=4096,
            log2_hashmap_size=22,
            hash_features_per_level=8,
            hash_smoothstep=False,
            use_position_encoding=False,
        ),
        background_model="grid",
        eval_num_rays_per_chunk=1024,
        level_init=8,
        eikonal_loss_mult=0.01,
        use_anneal_beta=True,
        enable_progressive_hash_encoding=True,
        enable_numerical_gradients_schedule=True,
        enable_curvature_loss_schedule=True,
        curvature_loss_multi=5e-4,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(1000000)),
        "field": OptimizerGroupConfig(_adam(1e-3), _multistep_warmup(5000, [600000, 800000])),
        "field_background": OptimizerGroupConfig(
            _adam(1e-3, kind="adamw"), _multistep_warmup(5000, [300000, 400000])
        ),
    },
    dict(max_num_iterations=1000001, steps_per_eval_image=5000),
    rays_per_batch=2048,
)

# --- neuralangelo (method_configs.py:184-243) ------------------------------
method_configs["neuralangelo"] = _surface_cfg(
    "neuralangelo",
    NeuralangeloModel,
    NeuralangeloModelConfig(
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=1,
            num_layers_color=4,
            hidden_dim=256,
            hidden_dim_color=256,
            geometric_init=True,
            bias=0.5,
            beta_init=0.3,
            inside_outside=False,
            use_appearance_embedding=False,
            position_encoding_max_degree=6,
            use_numerical_gradients=True,
            base_res=64,
            max_res=4096,
            log2_hashmap_size=22,
            hash_features_per_level=8,
            hash_smoothstep=False,
            use_position_encoding=False,
        ),
        background_model="mlp",
        enable_progressive_hash_encoding=True,
        enable_curvature_loss_schedule=True,
        enable_numerical_gradients_schedule=True,
    ),
    {
        "field": OptimizerGroupConfig(
            _adam(1e-3, kind="adamw", weight_decay=0.01),
            _multistep_warmup(5000, [300000, 400000]),
        ),
        "field_background": OptimizerGroupConfig(
            _adam(1e-3, kind="adamw"), _multistep_warmup(5000, [300000, 400000])
        ),
    },
    dict(max_num_iterations=500001, steps_per_eval_image=5000),
    rays_per_batch=512,
)

# --- bakedsdf (method_configs.py:246-310) ----------------------------------
method_configs["bakedsdf"] = _surface_cfg(
    "bakedsdf",
    BakedSDFFactoModel,
    BakedSDFModelConfig(
        near_plane=0.2,
        far_plane=1000.0,
        overwrite_near_far_plane=True,
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=2,
            num_layers_color=2,
            hidden_dim=256,
            hidden_dim_color=256,
            geometric_init=True,
            bias=0.05,
            beta_init=0.1,
            inside_outside=False,
            use_appearance_embedding=False,
            position_encoding_max_degree=8,
            use_diffuse_color=True,
            use_specular_tint=True,
            use_reflections=True,
            use_n_dot_v=True,
            off_axis=True,
        ),
        eikonal_loss_mult=0.01,
        background_model="none",
        proposal_weights_anneal_max_num_iters=1000,
        use_anneal_beta=True,
        eval_num_rays_per_chunk=1024,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(250000)),
        "field": OptimizerGroupConfig(_adam(1e-2), _neus_sched(500, 0.05, 250000)),
        "field_background": OptimizerGroupConfig(_adam(1e-3), _neus_sched(500, 0.05, 250000)),
    },
    dict(max_num_iterations=250001, steps_per_eval_image=5000),
    rays_per_batch=8192,
)

# --- bakedsdf-mlp (method_configs.py:313-378) ------------------------------
method_configs["bakedsdf-mlp"] = _surface_cfg(
    "bakedsdf-mlp",
    BakedSDFFactoModel,
    BakedSDFModelConfig(
        near_plane=0.2,
        far_plane=1000.0,
        overwrite_near_far_plane=True,
        sdf_field=SDFFieldConfig(
            use_grid_feature=False,
            num_layers=8,
            num_layers_color=2,
            hidden_dim=1024,
            hidden_dim_color=256,
            geometric_init=True,
            bias=0.05,
            beta_init=0.1,
            inside_outside=False,
            use_appearance_embedding=False,
            position_encoding_max_degree=8,
            use_diffuse_color=True,
            use_specular_tint=True,
            use_reflections=True,
            use_n_dot_v=True,
            off_axis=True,
        ),
        eikonal_loss_mult=0.01,
        background_model="none",
        use_anneal_beta=True,
        proposal_weights_anneal_max_num_iters=20000,
        eval_num_rays_per_chunk=1024,
        use_spatial_varying_eikonal_loss=True,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(250000)),
        "field": OptimizerGroupConfig(_adam(2e-3), _neus_sched(500, 0.05, 250000)),
        "field_background": OptimizerGroupConfig(_adam(1e-3), _neus_sched(500, 0.05, 250000)),
    },
    dict(max_num_iterations=250001, steps_per_eval_image=5000),
    rays_per_batch=4096,
)

# --- bakedangelo (method_configs.py:111-181) -------------------------------
method_configs["bakedangelo"] = _surface_cfg(
    "bakedangelo",
    BakedAngeloModel,
    BakedAngeloModelConfig(
        near_plane=0.01,
        far_plane=1000.0,
        overwrite_near_far_plane=True,
        sdf_field=SDFFieldConfig(
            use_grid_feature=True,
            num_layers=1,
            num_layers_color=4,
            hidden_dim=256,
            hidden_dim_color=256,
            geometric_init=True,
            bias=1.5,
            beta_init=0.1,
            inside_outside=True,
            use_appearance_embedding=True,
            use_numerical_gradients=True,
            base_res=64,
            max_res=4096,
            log2_hashmap_size=22,
            hash_features_per_level=8,
            hash_smoothstep=False,
            use_position_encoding=False,
        ),
        eikonal_loss_mult=0.01,
        background_model="grid",
        proposal_weights_anneal_max_num_iters=10000,
        use_anneal_beta=True,
        eval_num_rays_per_chunk=1024,
        use_spatial_varying_eikonal_loss=False,
        steps_per_level=10000,
        curvature_loss_warmup_steps=20000,
        beta_anneal_end=0.0002,
        beta_anneal_max_num_iters=1000000,
    ),
    {
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(1000000)),
        "field": OptimizerGroupConfig(
            _adam(1e-3, kind="adamw", weight_decay=1e-2),
            _multistep_warmup(5000, [600000, 800000]),
        ),
        "field_background": OptimizerGroupConfig(
            _adam(1e-3, kind="adamw"), _multistep_warmup(5000, [300000, 400000])
        ),
    },
    dict(max_num_iterations=1000001, steps_per_eval_image=5000),
    rays_per_batch=8192,
)


# --- neus-acc (method_configs.py:938-974) ----------------------------------
from sdfstudio_tpu.models.neus_acc import NeuSAccModel, NeuSAccModelConfig

method_configs["neus-acc"] = _surface_cfg(
    "neus-acc",
    NeuSAccModel,
    NeuSAccModelConfig(eval_num_rays_per_chunk=1024),
    {
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
        "field_background": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 20000)),
    },
    dict(max_num_iterations=20000, steps_per_eval_image=5000),
    rays_per_batch=2048,
)

# --- instant-ngp (method_configs.py:1026-1046) -----------------------------
from sdfstudio_tpu.models.instant_ngp import InstantNGPModelConfig, NGPModel


def _register_instant_ngp():
    from sdfstudio_tpu.data.dataparsers.blender import Blender, BlenderDataParserConfig

    method_configs["instant-ngp"] = Config(
        method_name="instant-ngp",
        trainer=TrainerConfig(
            steps_per_eval_batch=5000,
            steps_per_eval_image=5000,
            steps_per_save=20000,
            max_num_iterations=20001,
            # reference instant-ngp runs DynamicBatchPipeline with a 1<<18
            # sample budget (method_configs.py:1026-1046, dynamic_batch.py:34)
            dynamic_batch=True,
            target_num_samples=1 << 18,
        ),
        datamanager=DataManagerConfig(train_num_rays_per_batch=8192),
        model=InstantNGPModelConfig(render_step_size=0.005, eval_num_rays_per_chunk=8192),
        model_class=NGPModel,
        dataparser=BlenderDataParserConfig(),
        dataparser_class=Blender,
        optimizers={
            "field": OptimizerGroupConfig(_adam(1e-2), _multistep(20000)),
        },
    )


_register_instant_ngp()

# --- density baselines -----------------------------------------------------
from sdfstudio_tpu.data.dataparsers.blender import Blender, BlenderDataParserConfig
from sdfstudio_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from sdfstudio_tpu.models.vanilla_nerf import (
    MipNerfModel,
    MipNerfModelConfig,
    NeRFModel,
    VanillaModelConfig,
)

# vanilla-nerf (method_configs.py:1047-1066)
method_configs["vanilla-nerf"] = Config(
    method_name="vanilla-nerf",
    trainer=TrainerConfig(max_num_iterations=1000000),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    model=VanillaModelConfig(),
    model_class=NeRFModel,
    dataparser=BlenderDataParserConfig(),
    dataparser_class=Blender,
    optimizers={
        "field": OptimizerGroupConfig(_adam(5e-4, eps=1e-8, kind="radam")),
        "temporal_distortion": OptimizerGroupConfig(_adam(5e-4, eps=1e-8, kind="radam")),
    },
)

# dnerf (method_configs.py:1089-1109)
method_configs["dnerf"] = Config(
    method_name="dnerf",
    trainer=TrainerConfig(max_num_iterations=1000000),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    model=VanillaModelConfig(enable_temporal_distortion=True),
    model_class=NeRFModel,
    dataparser=BlenderDataParserConfig(),
    dataparser_class=Blender,
    optimizers={
        "field": OptimizerGroupConfig(_adam(5e-4, eps=1e-8, kind="radam")),
        "temporal_distortion": OptimizerGroupConfig(_adam(5e-4, eps=1e-8, kind="radam")),
    },
)

# mipnerf (method_configs.py:1005-1025)
method_configs["mipnerf"] = Config(
    method_name="mipnerf",
    trainer=TrainerConfig(max_num_iterations=1000000),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    model=MipNerfModelConfig(eval_num_rays_per_chunk=1024),
    model_class=MipNerfModel,
    dataparser=BlenderDataParserConfig(),
    dataparser_class=Blender,
    optimizers={"field": OptimizerGroupConfig(_adam(5e-4, eps=1e-8, kind="radam"))},
)

# nerfacto (method_configs.py:976-1003) — nerfstudio-data when available
method_configs["nerfacto"] = Config(
    method_name="nerfacto",
    trainer=TrainerConfig(
        steps_per_eval_batch=5000, steps_per_save=2000, max_num_iterations=30000
    ),
    datamanager=DataManagerConfig(
        train_num_rays_per_batch=4096,
        eval_num_rays_per_batch=4096,
        camera_optimizer=CameraOptimizerConfig(mode="SO3xR3"),
    ),
    model=NerfactoModelConfig(eval_num_rays_per_chunk=1 << 15),
    model_class=NerfactoModel,
    dataparser=BlenderDataParserConfig(),
    dataparser_class=Blender,
    optimizers={
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2), _multistep(300000)),
        "field": OptimizerGroupConfig(_adam(1e-2), _multistep(300000)),
    },
)


# tensorf (method_configs.py:1067-1087)
from sdfstudio_tpu.models.tensorf import TensoRFModel, TensoRFModelConfig

method_configs["tensorf"] = Config(
    method_name="tensorf",
    trainer=TrainerConfig(max_num_iterations=30000),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    model=TensoRFModelConfig(),
    model_class=TensoRFModel,
    dataparser=BlenderDataParserConfig(),
    dataparser_class=Blender,
    optimizers={
        "field": OptimizerGroupConfig(
            _adam(0.001, eps=1e-8),
            SchedulerConfig(kind="exponential_decay", lr_final=0.0001, max_steps=30000),
        ),
        "encodings": OptimizerGroupConfig(
            _adam(0.02, eps=1e-8),
            SchedulerConfig(kind="exponential_decay", lr_final=0.002, max_steps=30000),
        ),
    },
)


# --- neusW (method_configs.py:899-936) --------------------------------------
from sdfstudio_tpu.data.dataparsers.colmap_family import Heritage, HeritageDataParserConfig
from sdfstudio_tpu.models.neuralreconW import NeuralReconWModel, NeuralReconWModelConfig

method_configs["neusW"] = _surface_cfg(
    "neusW",
    NeuralReconWModel,
    NeuralReconWModelConfig(
        background_model="grid",
        num_samples_outside=4,
        eikonal_loss_mult=1e-4,
        eval_num_rays_per_chunk=1024,
    ),
    {
        "field": OptimizerGroupConfig(_adam(1e-3), _neus_sched(500, 0.05, 300000)),
        "field_background": OptimizerGroupConfig(_adam(1e-2), _multistep(300000)),
    },
    dict(max_num_iterations=100000, steps_per_eval_image=5000, steps_per_save=5000),
    rays_per_batch=2048,
)
method_configs["neusW"].dataparser = HeritageDataParserConfig()
method_configs["neusW"].dataparser_class = Heritage

# --- dto (method_configs.py:862-897) ----------------------------------------
from sdfstudio_tpu.models.dto import DtoOModel, DtoOModelConfig

method_configs["dto"] = _surface_cfg(
    "dto",
    DtoOModel,
    DtoOModelConfig(eval_num_rays_per_chunk=1 << 10),
    {
        # reference groups (method_configs.py:883-895): "occupancy_field"
        # (the SDF, lr 5e-4 + NeuS warmup-cosine) is our "field";
        # "fields" (the shared nerfacto bg, lr 1e-2) is "field_background"
        "field": OptimizerGroupConfig(_adam(5e-4), _neus_sched(500, 0.05, 300000)),
        "field_background": OptimizerGroupConfig(_adam(1e-2), _multistep(300000)),
    },
    dict(max_num_iterations=100000, steps_per_eval_image=2000, steps_per_save=5000),
    rays_per_batch=2048,
)

# --- semantic-nerfw (method_configs.py:1048-1066) ---------------------------
from sdfstudio_tpu.data.dataparsers.misc_parsers import Friends, FriendsDataParserConfig
from sdfstudio_tpu.models.semantic_nerfw import SemanticNerfWModel, SemanticNerfWModelConfig

method_configs["semantic-nerfw"] = Config(
    method_name="semantic-nerfw",
    trainer=TrainerConfig(steps_per_eval_batch=500, steps_per_save=2000, max_num_iterations=30000),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096, eval_num_rays_per_batch=4096),
    model=SemanticNerfWModelConfig(eval_num_rays_per_chunk=1 << 16),
    model_class=SemanticNerfWModel,
    dataparser=FriendsDataParserConfig(),
    dataparser_class=Friends,
    optimizers={
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2)),
        "field": OptimizerGroupConfig(_adam(1e-2)),
    },
)

# --- phototourism (method_configs.py:1111-1140) -----------------------------
from sdfstudio_tpu.data.dataparsers.colmap_family import (
    Phototourism,
    PhototourismDataParserConfig,
)

method_configs["phototourism"] = Config(
    method_name="phototourism",
    trainer=TrainerConfig(steps_per_eval_batch=500, steps_per_save=2000, max_num_iterations=30000),
    datamanager=DataManagerConfig(
        train_num_rays_per_batch=4096,
        eval_num_rays_per_batch=4096,
        camera_optimizer=CameraOptimizerConfig(mode="SO3xR3"),
    ),
    model=NerfactoModelConfig(eval_num_rays_per_chunk=1 << 15),
    model_class=NerfactoModel,
    dataparser=PhototourismDataParserConfig(),
    dataparser_class=Phototourism,
    optimizers={
        "proposal_networks": OptimizerGroupConfig(_adam(1e-2)),
        "field": OptimizerGroupConfig(_adam(1e-2)),
    },
)

descriptions.update({
    "neusW": "Neural reconstruction in the wild (heritage).",
    "dto": "Occupancy-grid-guided NeuS with density-field background.",
    "semantic-nerfw": "Semantic segmentation + transient filtering.",
    "phototourism": "Nerfacto on phototourism captures.",
    "dnerf": "Dynamic NeRF with temporal deformation.",
    "vanilla-nerf": "Original NeRF.",
})

# geo-* methods sample rays from a single reference image with source views
import dataclasses as _dc

for _geo in ("geo-neus", "geo-volsdf", "geo-unisurf"):
    method_configs[_geo].datamanager = _dc.replace(
        method_configs[_geo].datamanager, kind="flexible"
    )


def get_method_config(name: str) -> Config:
    import copy

    if name not in method_configs:
        raise ValueError(
            f"unknown method '{name}'; available: {', '.join(sorted(method_configs))}"
        )
    return copy.deepcopy(method_configs[name])
