"""Offline RHGM: generate hybrid (virtual + foreground-real) radar points.

End-to-end equivalent of the reference's hybrid-point scripts
(hybrid_pts/hybrid_radar_pts_vod.py __main__:418-468 and
hybrid_radar_pts_tj4d.py): for every frame of a KITTI-style raw tree,
obtain instance masks, project the radar points into the image, run the
RHGM sampling (Gaussian sigma=7 + uniform, k=1/k=4 depth transfer,
hgsfusion_tpu/rhgm/generator.py), and save
`<pts_save_path>/<frame_id>.pkl.npy` dicts with `virtual_points` /
`real_points` — the exact files the dataset loader consumes
(vod_dataset.get_virtual_point:108-115; our kitti_base.get_virtual_points).

Mask sources (--mask_source):
  model        run the TPU-native Mask2Former-class instance segmentation
               model (rhgm/mask2former.py; weights from --ckpt, an orbax
               checkpoint — the reference uses a pretrained detectron2
               Mask2Former, hybrid_radar_pts_vod.py:52-57).
  precomputed  load per-frame `<masks_dir>/<frame_id>.npz` files with
               arrays `masks` (M, H, W), `labels` (M,) cityscapes-things
               ids, optional `scores` (M,) — i.e. exported Mask2Former
               outputs from any external segmentor.
  gtbox        rasterize the 2D gt boxes of `label_2` into instance masks
               (annotation-driven generation; useful without a segmentor).

Example:
  python tools/generate_hybrid_points.py --dataset vod \
      --data_root data/vod --pts_save_path data/vod/training/virtual_points \
      --mask_source precomputed --masks_dir data/vod/training/m2f_masks
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hgsfusion_tpu.rhgm.generator import (  # noqa: E402
    generate_hybrid_points,
    masks_from_gt_boxes2d,
)
from hgsfusion_tpu.rhgm.mask2former import CITYSCAPES_THINGS  # noqa: E402

# cityscapes-things bin for each KITTI/VoD/TJ4D annotation class the gtbox
# source can encounter (reference label semantics: the 8 one-hot columns of
# the saved layout are cityscapes instance classes)
_ANNOT_TO_THING = {
    "Pedestrian": 0, "person": 0, "Cyclist": 1, "rider": 1, "Car": 2,
    "car": 2, "Van": 2, "Truck": 3, "truck": 3, "Bus": 4, "bus": 4,
    "Tram": 5, "train": 5, "Motorcycle": 6, "motorcycle": 6,
    "bicycle": 7, "Bicycle": 7,
}

_DATASETS = {
    # image rows used, image ext, radar feature columns after xyz
    "vod": dict(image_hw=(516, 1936), ext=".jpg", radar_dims=7),
    "tj4d": dict(image_hw=(810, 1280), ext=".png", radar_dims=8),
}


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=sorted(_DATASETS), default="vod")
    p.add_argument("--data_root", required=True,
                   help="KITTI-style root: training/{velodyne,calib,...}")
    p.add_argument("--split", default="train",
                   help="ImageSets/<split>.txt frame list; falls back to "
                        "every velodyne file")
    p.add_argument("--pts_save_path", required=True)
    p.add_argument("--mask_source", default="model",
                   choices=("model", "precomputed", "gtbox"))
    p.add_argument("--masks_dir", default=None,
                   help="precomputed: directory of <frame_id>.npz files")
    p.add_argument("--ckpt", default=None,
                   help="model: weights for Mask2FormerInstance — either an "
                        "orbax checkpoint dir (self-trained) or the "
                        "published detectron2 .pkl/.pth (swin-L cityscapes "
                        "model_final_*.pkl; converted on load via "
                        "train/torch_convert.convert_mask2former_state). "
                        "Randomly initialized when omitted — only useful "
                        "for pipeline validation")
    p.add_argument("--resize_shortest", type=int, default=0,
                   help="model: resize the shortest image edge to this "
                        "before segmentation, as the reference predictor "
                        "does (detectron2 ResizeShortestEdge, "
                        "MIN_SIZE_TEST=1024 in the cityscapes config); "
                        "masks come back at the original size. 0 = off")
    p.add_argument("--confidence_threshold", type=float, default=0.5,
                   help="model: min instance score "
                        "(hybrid_radar_pts_vod.py:72-77)")
    p.add_argument("--num_virtual", type=int, default=100)
    p.add_argument("--dist_thresh", type=float, default=3000.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--model_preset", default="large",
                   choices=("large", "tiny"),
                   help="model: swin-L (reference scale) or a tiny variant "
                        "for smoke tests")
    p.add_argument("--pixel_decoder", default="msdeform",
                   choices=("msdeform", "fpn"),
                   help="model: msdeform matches the published checkpoints "
                        "(required for --ckpt *.pkl import); fpn is the "
                        "gather-free variant — pass it to load self-trained "
                        "orbax checkpoints from the FPN-decoder model")
    p.add_argument("--image_hw", type=int, nargs=2, default=None,
                   help="override the dataset's image size (synthetic or "
                        "re-cropped trees)")
    return p.parse_args()


def frame_ids(root: Path, split: str):
    f = root / "ImageSets" / f"{split}.txt"
    if f.exists():
        return [ln.strip() for ln in f.read_text().splitlines() if ln.strip()]
    return sorted(p.stem for p in (root / "training/velodyne").glob("*.bin"))


def load_calib(root: Path, idx: str):
    """lidar->cam 4x4 and the 3x3 intrinsics, the exact matrices the
    reference generator consumes (process_one_frame:363-364 takes
    info['calib']['Tr_velo_to_cam'] and P2[:3, :3] — note: no R0
    rectification and no P2 translation column in this offline path)."""
    from hgsfusion_tpu.utils.calibration import get_calib_from_file

    c = get_calib_from_file(root / "training/calib" / f"{idx}.txt")
    v2c = np.vstack([c["Tr_velo2cam"], [0.0, 0.0, 0.0, 1.0]]).astype(
        np.float32)
    k = np.zeros((3, 4), np.float32)
    k[:3, :3] = c["P2"][:3, :3]
    return v2c, k


def load_gt_masks(root: Path, idx: str, image_hw):
    boxes, classes = [], []
    f = root / "training/label_2" / f"{idx}.txt"
    if f.exists():
        for ln in f.read_text().splitlines():
            t = ln.split()
            if len(t) < 8 or t[0] not in _ANNOT_TO_THING:
                continue
            boxes.append([float(x) for x in t[4:8]])
            classes.append(_ANNOT_TO_THING[t[0]])
    if not boxes:
        return np.zeros((0,) + tuple(image_hw), bool), np.zeros(0, np.int64)
    return masks_from_gt_boxes2d(
        np.asarray(boxes, np.float32), np.asarray(classes), image_hw)


def load_precomputed_masks(masks_dir: Path, idx: str, image_hw, thresh):
    f = masks_dir / f"{idx}.npz"
    if not f.exists():
        return np.zeros((0,) + tuple(image_hw), bool), np.zeros(0, np.int64)
    d = np.load(f)
    masks = d["masks"].astype(bool)
    labels = d["labels"].astype(np.int64)
    if "scores" in d:
        keep = d["scores"] >= thresh
        masks, labels = masks[keep], labels[keep]
    keep = masks.any(axis=(1, 2))  # reference postprocess:327-331
    return masks[keep], labels[keep]


class ModelMaskSource:
    """Jitted Mask2FormerInstance + instance_inference at a fixed size.

    With resize_shortest > 0 the image is bilinearly resized so its
    shortest edge matches (the reference predictor's ResizeShortestEdge;
    1024 for the cityscapes config) before segmentation; instance masks
    are produced directly at the ORIGINAL size by resizing the mask
    logits there (the reference goes logits -> padded size -> original,
    two bilinears; one bilinear is numerically equivalent to well within
    the >0 binarization threshold's tolerance).
    """

    def __init__(self, preset: str, ckpt: str | None, image_hw, thresh,
                 resize_shortest: int = 0, pixel_decoder: str = "msdeform"):
        import jax
        import jax.numpy as jnp

        from hgsfusion_tpu.rhgm.mask2former import (
            Mask2FormerInstance,
            instance_inference,
        )

        kw = {"pixel_decoder": pixel_decoder}
        if preset == "tiny":
            kw.update(embed_dims=32, depths=(1, 1, 2, 1),
                      num_heads=(1, 2, 4, 8), window_size=4, hidden_dim=64,
                      num_queries=20, dec_layers=3, dim_feedforward=128,
                      pd_enc_layers=2, pd_ffn=256)
        self.model = Mask2FormerInstance(**kw)
        self.image_hw = tuple(image_hw)
        if resize_shortest and resize_shortest > 0:
            s = resize_shortest / min(self.image_hw)
            self.model_hw = (int(round(self.image_hw[0] * s)),
                             int(round(self.image_hw[1] * s)))
        else:
            self.model_hw = self.image_hw
        self.thresh = float(thresh)
        dummy = jnp.zeros((1,) + self.model_hw + (3,), jnp.float32)
        if ckpt and (str(ckpt).endswith(".pkl")
                     or str(ckpt).endswith(".pth")
                     or str(ckpt).endswith(".pt")):
            # published detectron2 checkpoint (e.g. the swin-L cityscapes
            # model_final_*.pkl the reference pipeline runs,
            # hybrid_radar_pts_vod.py:34-42) -> torch->flax conversion
            from hgsfusion_tpu.train.torch_convert import (
                convert_mask2former_state,
                load_d2_checkpoint,
            )

            state = load_d2_checkpoint(ckpt)
            self.variables = self.model.init(
                jax.random.PRNGKey(0), dummy, False)
            self.variables, report = convert_mask2former_state(
                state, self.variables)
            if report["missing"] or report["unmatched"]:
                print("[generate_hybrid_points] checkpoint mapping "
                      f"incomplete: missing={report['missing'][:5]} "
                      f"unmatched={report['unmatched'][:5]} "
                      f"(copied {len(report['copied'])})")
            else:
                print(f"[generate_hybrid_points] imported "
                      f"{len(report['copied'])} tensors from {ckpt}")
        elif ckpt:
            import orbax.checkpoint as ocp

            self.variables = ocp.StandardCheckpointer().restore(
                str(Path(ckpt).resolve()))
        else:
            print("[generate_hybrid_points] WARNING: --ckpt not given; "
                  "running a RANDOMLY INITIALIZED segmentor (pipeline "
                  "validation only, masks are meaningless)")
            self.variables = self.model.init(
                jax.random.PRNGKey(0), dummy, False)

        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])

        def fwd(img):
            if self.model_hw != self.image_hw:
                from hgsfusion_tpu.models.layers import resize_bilinear

                img = resize_bilinear(img, self.model_hw)
            out = self.model.apply(self.variables, (img - mean) / std, False)
            # mask logits resized straight to the ORIGINAL image size
            return instance_inference(
                out["pred_logits"], out["pred_masks"], self.image_hw)

        self._fwd = jax.jit(fwd)

    def __call__(self, image):
        import jax.numpy as jnp

        h, w = self.image_hw
        img = np.zeros((1, h, w, 3), np.float32)
        ih, iw = min(h, image.shape[0]), min(w, image.shape[1])
        img[0, :ih, :iw] = image[:ih, :iw]
        labels, scores, masks = self._fwd(jnp.asarray(img))
        labels, scores, masks = (np.asarray(labels), np.asarray(scores),
                                 np.asarray(masks))
        keep = scores >= self.thresh
        return masks[keep], labels[keep].astype(np.int64)


def main():
    args = parse_args()
    spec = dict(_DATASETS[args.dataset])
    if args.image_hw:
        spec["image_hw"] = tuple(args.image_hw)
    root = Path(args.data_root)
    out_dir = Path(args.pts_save_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    ids = frame_ids(root, args.split)
    if args.max_frames:
        ids = ids[: args.max_frames]
    if not ids:
        raise SystemExit(f"no frames found under {root}")

    model_src = None
    if args.mask_source == "model":
        model_src = ModelMaskSource(
            args.model_preset, args.ckpt, spec["image_hw"],
            args.confidence_threshold,
            resize_shortest=args.resize_shortest,
            pixel_decoder=args.pixel_decoder)
    elif args.mask_source == "precomputed" and not args.masks_dir:
        raise SystemExit("--mask_source precomputed needs --masks_dir")

    rng = np.random.RandomState(args.seed)
    n_virtual_total = 0
    for i, idx in enumerate(ids):
        pts_f = root / "training/velodyne" / f"{idx}.bin"
        raw = np.fromfile(pts_f, np.float32).reshape(-1, spec["radar_dims"])
        v2c, k = load_calib(root, idx)

        if args.mask_source == "gtbox":
            masks, labels = load_gt_masks(root, idx, spec["image_hw"])
        elif args.mask_source == "precomputed":
            masks, labels = load_precomputed_masks(
                Path(args.masks_dir), idx, spec["image_hw"],
                args.confidence_threshold)
        else:
            from PIL import Image

            img_f = root / "training/image_2" / f"{idx}{spec['ext']}"
            image = np.asarray(
                Image.open(str(img_f)).convert("RGB"), np.float32) / 255.0
            # TJ4D crops to the top 810 rows (hybrid_radar_pts_tj4d.py:127)
            image = image[: spec["image_hw"][0]]
            masks, labels = model_src(image)

        res = generate_hybrid_points(
            masks, labels, raw, v2c, k, num_virtual=args.num_virtual,
            dist_thresh=args.dist_thresh, rng=rng)
        np.save(out_dir / f"{idx}.pkl", res)  # np.save appends .npy
        n_virtual_total += len(res["virtual_points"])
        if (i + 1) % 50 == 0 or i + 1 == len(ids):
            print(f"[{i + 1}/{len(ids)}] {idx}: "
                  f"{len(res['virtual_points'])} virtual / "
                  f"{len(res['real_points'])} fg-real points")
    print(f"done: {len(ids)} frames -> {out_dir} "
          f"({n_virtual_total} virtual points total)")


if __name__ == "__main__":
    main()
