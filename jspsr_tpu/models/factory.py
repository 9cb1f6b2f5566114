"""Model registry (replaces reference utils/common_config.py:16-104, fixing
the dangling-else bug that made every non-JSPSR model name raise after
construction — SURVEY 2.2)."""

from __future__ import annotations

BRANCH_KEYS = ("lr_dem", "image", "mask", "canopy", "coord")


def _branch_channels(input_data: dict) -> dict:
    return {k: v for k, v in input_data.items() if k in BRANCH_KEYS and v}


def build_model(p):
    """p: config with model_name / model_kwargs / input_data."""
    name = p.model_name.lower()
    mk = p.model_kwargs
    input_data = _branch_channels(p.input_data)

    if name == "jspsr":
        from jspsr_tpu.models.jspsr import JSPSR

        nb = mk.get("num_block", 2)
        return JSPSR(
            in_channels=input_data,
            out_channels=1,
            num_feature=mk.get("num_feature", 32),
            layers=(nb, nb, nb, nb),
            spn=mk.get("spn", True),
            spn_scale=mk.get("spn_scale", 1.0),
            cat_only=mk.get("cat_only", True),
            generator_leaky=mk.get("generator_leaky", False),
            remat_stages=mk.get("remat_stages", False),
            fuse_stems=mk.get("fuse_stems", False),
            eval_grouped=mk.get("eval_grouped", False),
            compute_dtype=mk.get("compute_dtype", None),
            spn_sample_dtype=mk.get("spn_sample_dtype", None),
        )
    if name == "edsr":
        from jspsr_tpu.models.edsr import EDSR

        in_channels = sum(input_data.values())
        return EDSR(
            in_channels=in_channels,
            out_channels=1,
            n_resblocks=mk.get("num_block", 16),
            n_features=mk.get("num_feature", 64),
            scale=1,
            spn=mk.get("spn", False),
        )
    if name == "lrru":
        from jspsr_tpu.models.lrru import LRRU

        return LRRU(
            in_channels=input_data,
            out_channels=1,
            kernel_size=mk.get("kernel_size", 3),
            bc=mk.get("bc", 16),
            prob=mk.get("prob", 1.0),
            dkn_residual=mk.get("dkn_residual", True),
        )
    if name == "completionformer":
        from jspsr_tpu.models.completionformer import CompletionFormer

        return CompletionFormer(
            in_channels=input_data,
            out_channels=1,
            prop_time=mk.get("prop_time", 6),
            prop_kernel=mk.get("prop_kernel", 3),
            conf_prop=mk.get("conf_prop", True),
            affinity=mk.get("affinity", "TGASS"),
            affinity_gamma=mk.get("affinity_gamma", 0.5),
        )
    raise NotImplementedError(f"Unsupported model name {p.model_name}")
