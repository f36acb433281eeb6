"""Fetch / convert 2D-backbone pretrained weights for the image branch.

The reference initializes its Res50UNet encoder from torchvision
ImageNet, MoCo, or pri3d checkpoints (reference lib/trainer.py:49-70,
models/resnet.py:191-216).  This repo's importer
(pcrcg_tpu/models/torch_import.py, parity-tested) ingests the same .pth
layouts directly — this script just materializes a checkpoint file at
the path the config expects and validates it end-to-end through the
importer.

Modes:
  --mode imagenet   download torchvision resnet50 ImageNet weights
                    (needs egress; uses torch.hub's cache)
  --mode file       convert/validate a local checkpoint you already have
                    (pri3d Scannet.pth, MoCo, 3dmatch — any layout the
                    importer knows), copying it to --out
After either mode the checkpoint is loaded into a fresh PCRCG backbone
and the import report printed: every encoder tensor must match.

Usage:
  python scripts/fetch_2d_weights.py --mode imagenet --out weights/resnet50_imagenet.pth
  python scripts/fetch_2d_weights.py --mode file --src /path/Scannet.pth --out weights/pri3d.pth
Then point the config at it:  model: {init_mode: image_net,
image_net_pth_path: weights/resnet50_imagenet.pth}  (or pri3d_pth_path).
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch_imagenet(out: str) -> str:
    import torch

    url = "https://download.pytorch.org/models/resnet50-0676ba61.pth"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    try:
        sd = torch.hub.load_state_dict_from_url(url, progress=False, map_location="cpu")
    except Exception as e:  # no egress in this environment — say so clearly
        raise SystemExit(
            f"download failed ({e}); fetch {url} on a machine with network "
            "access and re-run with --mode file --src <downloaded.pth>"
        )
    torch.save(sd, out)
    return out


def validate(path: str) -> None:
    """Import the checkpoint into a fresh backbone; fail on poor coverage."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from pcrcg_tpu.models.resunet import ResUNet
    from pcrcg_tpu.models.torch_import import load_backbone2d

    model = ResUNet(depth=50)
    variables = jax.jit(model.init)(
        jax.random.key(0), np.zeros((1, 64, 96, 3), np.float32)
    )
    merged, report = load_backbone2d(path, dict(variables))
    print(f"import report for {path}:")
    for k, v in sorted(report.items()):
        print(f"  {k}: {v}")
    loaded = report.get("loaded", 0)
    if loaded < 100:  # resnet50 encoder alone has ~160 weight tensors
        raise SystemExit(
            f"only {loaded} tensors imported — wrong checkpoint layout?"
        )
    print("OK: checkpoint drives the 2D backbone.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["imagenet", "file"], required=True)
    ap.add_argument("--src", default="", help="local .pth for --mode file")
    ap.add_argument("--out", default="weights/resnet50_imagenet.pth")
    ap.add_argument("--no-validate", action="store_true")
    args = ap.parse_args()

    if args.mode == "imagenet":
        path = fetch_imagenet(args.out)
    else:
        if not args.src or not os.path.exists(args.src):
            raise SystemExit(f"--src {args.src!r} not found")
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        if os.path.abspath(args.src) != os.path.abspath(args.out):
            shutil.copyfile(args.src, args.out)
        path = args.out
    if not args.no_validate:
        validate(path)


if __name__ == "__main__":
    main()
