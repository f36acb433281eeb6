"""Host-side loader throughput with the image path on: how many pairs/sec
can PairLoader produce (PNG decode + npz parse + padding + Morton sort)
at various num_threads?  The chip consumes ~6-11 pairs/s (PERF.md); the
loader must clear that with headroom or training starves
(reference runs 10 DataLoader workers, datasets/dataloader.py:459-472).

Builds a synthetic on-disk 3DMatch-layout fixture (real 640×480 PNGs,
16-bit depth, SuperGlue npzs) in a temp dir, then iterates
IndoorDataset(image_feature=True) through PairLoader.

Usage: JAX_PLATFORMS=cpu python scripts/measure_loader.py [--pairs 32]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_fixture(base, n_pairs: int, n_points: int = 26000):
    from PIL import Image
    import torch

    root = os.path.join(base, "data")
    img_root = os.path.join(base, "images")
    matches_root = os.path.join(base, "matches")
    scene_dir = os.path.join(root, "test", "scene1")
    seq_dir = os.path.join(img_root, "scene1", "seq-01")
    os.makedirs(scene_dir)
    os.makedirs(seq_dir)
    os.makedirs(matches_root)
    rng = np.random.default_rng(0)

    intr = np.eye(3)
    intr[0, 0] = intr[1, 1] = 585.0
    intr[0, 2], intr[1, 2] = 320.0, 240.0
    np.savetxt(os.path.join(img_root, "scene1", "camera-intrinsics.txt"), intr)

    def write_frame(fid):
        stem = os.path.join(seq_dir, f"frame-{fid:06d}")
        color = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
        Image.fromarray(color).save(stem + ".color.png")
        depth = rng.integers(500, 3000, size=(480, 640)).astype(np.uint16)
        Image.fromarray(depth).save(stem + ".depth.png")
        np.savetxt(stem + ".pose.txt", np.eye(4))

    infos = {"rot": [], "trans": [], "src": [], "tgt": [], "overlap": []}
    kp = rng.uniform(0, 120, size=(200, 2))
    for i in range(n_pairs):
        for c, fid0 in (("src", 4 * i), ("tgt", 4 * i + 2)):
            cloud = rng.uniform(0, 3, size=(n_points, 3)).astype(np.float32)
            name = f"cloud_bin_{2 * i + (0 if c == 'src' else 1)}"
            torch.save(torch.from_numpy(cloud), os.path.join(scene_dir, name + ".pth"))
            with open(os.path.join(scene_dir, name + ".info.txt"), "w") as f:
                f.write(f"scene1 seq-01 {fid0} {fid0 + 1}\n")
            write_frame(fid0)
            write_frame(fid0 + 1)
        for a, b in ((4 * i, 4 * i + 2), (4 * i + 1, 4 * i + 3)):
            np.savez(
                os.path.join(matches_root,
                             f"scene1_seq-01_frame-{a:06d}_scene1_seq-01_frame-{b:06d}_matches.npz"),
                keypoints0=kp, keypoints1=kp,
                matches=np.arange(200), match_confidence=rng.uniform(0, 1, 200),
            )
        infos["rot"].append(np.eye(3))
        infos["trans"].append(np.zeros((3, 1)))
        infos["src"].append(f"test/scene1/cloud_bin_{2 * i}.pth")
        infos["tgt"].append(f"test/scene1/cloud_bin_{2 * i + 1}.pth")
        infos["overlap"].append(0.5)
    return root, img_root, matches_root, infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=32)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--budget", type=int, default=26624)
    args = ap.parse_args()

    from pcrcg_tpu.config import Config
    from pcrcg_tpu.data.indoor import IndoorDataset
    from pcrcg_tpu.data.loader import PairLoader

    with tempfile.TemporaryDirectory() as base:
        root, img_root, matches_root, infos = build_fixture(base, args.pairs)
        cfg = Config(
            image_feature=True, in_feats_dim=129, img_num=2,
            root=root, img_path=img_root, superglue_matches_path=matches_root,
        )
        ds = IndoorDataset(infos, cfg, data_augmentation=True)
        for nt in args.threads:
            loader = PairLoader(ds, args.budget, num_threads=nt, prefetch=4, seed=0)
            # Warm one batch (imports, file cache)
            next(iter(loader))
            t0 = time.perf_counter()
            n = 0
            for batch, images in loader:
                assert images is not None
                n += batch.batch_size
            dt = time.perf_counter() - t0
            print(f"num_threads={nt}: {n / dt:.2f} pairs/s host "
                  f"({dt / n * 1000:.0f} ms/pair)", flush=True)


if __name__ == "__main__":
    main()
