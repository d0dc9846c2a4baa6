#!/usr/bin/env python
"""Import a reference PyTorch checkpoint (.pth) into an orbax checkpoint.

The reference's train loop saves per-epoch dicts with `model_state_dict`
(+ optimizers/schedulers/epoch/args — /root/reference/train.py:276-310).
This tool maps `model_state_dict` onto our flax parameter trees
(mtd_gan_tpu/utils/torch_import.py), drops them into a freshly-initialized
trainer state (optimizer state starts at zero, like the reference's own
`--from-pretrained` path), and writes an orbax checkpoint that
`test.py --resume <out>` / `train.py --resume <out>` restore directly:

    python tools/import_torch_checkpoint.py \
        --checkpoint epoch_500_checkpoint.pth \
        --model MTD_GAN_Method --out imported/mtd_gan

    python test.py --model MTD_GAN_Method --resume imported/mtd_gan \
        --data-root /path/to/mayo --save-dir predictions/imported

Covered: MTD_GAN_Method, RED_CNN, EDCNN, Restormer, CTformer, WGAN_VGG,
MAP_NN, DU_GAN, and all 10 Ablation_* variants (tests/test_torch_import.py
pins forward parity against the actual reference modules). Diffusion
checkpoints are not importable (no public pretrained checkpoints exist for
the vendored MONAI UNet).
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args_parser():
    p = argparse.ArgumentParser("torch checkpoint importer", add_help=False)
    p.add_argument("--checkpoint", required=True, type=str,
                   help="reference .pth checkpoint (or bare state dict)")
    p.add_argument("--model", required=True, type=str)
    p.add_argument("--out", required=True, type=str,
                   help="orbax checkpoint directory to create")
    p.add_argument("--model-kwargs", default="", type=str,
                   help="JSON kwargs for OUR model ctor (sizes must match "
                        "the torch checkpoint)")
    p.add_argument("--epoch", default=-1, type=int,
                   help="epoch number to save under (-1 = the checkpoint's)")
    p.add_argument("--method", default="", type=str,
                   help="MTO method for the trainer template; keep in sync "
                        "with the test.py/train.py flags you will use")
    p.add_argument("--optimizer", default="adamw", type=str)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--seed", default=42, type=int)
    return p


def load_torch_checkpoint(path: str) -> dict:
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints embed the argparse Namespace under 'args'
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt
    return {"model_state_dict": ckpt, "epoch": 0}


def _check_against_template(converted, template, field: str):
    """Every imported leaf must exist in the template with the same shape —
    a size mismatch (wrong --model-kwargs) fails loudly, not at restore."""
    import jax

    conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    tmpl_flat = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    if set(conv_flat) != set(tmpl_flat):
        missing = sorted(jax.tree_util.keystr(k) for k in
                         set(tmpl_flat) - set(conv_flat))[:8]
        extra = sorted(jax.tree_util.keystr(k) for k in
                       set(conv_flat) - set(tmpl_flat))[:8]
        raise ValueError(
            f"{field}: converted tree does not match the model template; "
            f"missing={missing} extra={extra}"
        )
    for k, v in conv_flat.items():
        want = tmpl_flat[k].shape
        if tuple(v.shape) != tuple(want):
            raise ValueError(
                f"{field}{jax.tree_util.keystr(k)}: shape {v.shape} != "
                f"model template {want} (check --model-kwargs)"
            )


def main(args):
    import jax
    import jax.numpy as jnp

    from mtd_gan_tpu.engine.loops import build_trainer
    from mtd_gan_tpu.models import get_model
    from mtd_gan_tpu.utils.checkpoint import CheckpointManager
    from mtd_gan_tpu.utils import torch_import

    ckpt = load_torch_checkpoint(args.checkpoint)
    model_kwargs = json.loads(args.model_kwargs or "{}")

    # forward size-relevant model kwargs to the converter (e.g. num_layers,
    # depth, num_blocks) so non-default geometries map correctly
    from mtd_gan_tpu.models import resolve_alias

    conv_fn = torch_import.CONVERTERS[resolve_alias(args.model)]
    conv_params = set(inspect.signature(conv_fn).parameters)
    conv_kwargs = {k: v for k, v in model_kwargs.items() if k in conv_params}
    converted = torch_import.convert_state_dict(
        args.model, ckpt["model_state_dict"], **conv_kwargs
    )

    model = get_model(args.model, **model_kwargs)
    trainer = build_trainer(args.model, model, args)
    state = trainer.create_state(jax.random.PRNGKey(args.seed))

    replacements = {}
    for field, tree in converted.items():
        _check_against_template(tree, getattr(state, field), field)
        template = getattr(state, field)
        replacements[field] = jax.tree_util.tree_map(
            lambda v, t: jnp.asarray(v, dtype=t.dtype), tree, template
        )
    state = state.replace(**replacements)

    epoch = args.epoch if args.epoch >= 0 else int(ckpt.get("epoch", 0))
    mgr = CheckpointManager(args.out)
    mgr.save(epoch, state)
    mgr.close()
    n_params = sum(
        int(v.size) for tree in replacements.values()
        for v in jax.tree_util.tree_leaves(tree)
    )
    print(f"imported {args.model} epoch {epoch}: "
          f"{n_params:,} weights -> {args.out}")
    print(f"score it:  python test.py --model {args.model} "
          f"--resume {args.out} --data-root <mayo>")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "torch checkpoint importer", parents=[get_args_parser()]
    )
    main(parser.parse_args())
