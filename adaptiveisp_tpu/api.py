"""Convenience API — the torch-hub entry analog (reference hubconf.py).

One-call constructors for the three model families plus a loaded end-to-end
pipeline object usable for inference:

    import adaptiveisp_tpu.api as api
    isp = api.load_adaptive_isp(agent_ckpt=None)      # random init demo
    out = isp.process(images_nhwc)                    # 5-step adaptive ISP
    det = api.load_detector(weights="yolov3.pt")
    boxes, n = det.detect(out)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.config import Config, DEFAULT_CONFIG


@dataclasses.dataclass
class AdaptiveISP:
    """Loaded agent + jitted rollout."""

    cfg: Config
    agent: Any
    variables: Any
    steps: int = 5

    def __post_init__(self):
        from adaptiveisp_tpu.eval.rollout import jit_rollout

        self._roll = jit_rollout(self.agent, steps=self.steps)
        self._rng = np.random.RandomState(0)

    def process(self, images, pipeline: Optional[Sequence[int]] = None,
                seed: Optional[int] = None):
        """images: [N, H, W, 3] float32 in [0, 1] -> retouched images."""
        from adaptiveisp_tpu.eval.rollout import no_pipeline
        from adaptiveisp_tpu.policy.states import (get_initial_states,
                                                   get_noise)

        images = jnp.asarray(images, jnp.float32)
        n = images.shape[0]
        rng = np.random.RandomState(seed) if seed is not None else self._rng
        noises = jnp.asarray(np.stack(
            [get_noise(rng, n, self.cfg.z_dim, self.cfg.z_type)
             for _ in range(self.steps)]))
        states = jnp.asarray(get_initial_states(n, self.cfg.num_state_dim))
        pipe = (no_pipeline(self.steps) if pipeline is None
                else jnp.asarray([(-1 if p is None else int(p))
                                  for p in pipeline], jnp.int32))
        res = self._roll(self.variables, images, noises, states, pipe)
        return res.image

    def process_with_trace(self, images, **kw):
        from adaptiveisp_tpu.eval.rollout import no_pipeline
        from adaptiveisp_tpu.policy.states import (get_initial_states,
                                                   get_noise)

        images = jnp.asarray(images, jnp.float32)
        n = images.shape[0]
        noises = jnp.asarray(np.stack(
            [get_noise(self._rng, n, self.cfg.z_dim, self.cfg.z_type)
             for _ in range(self.steps)]))
        states = jnp.asarray(get_initial_states(n, self.cfg.num_state_dim))
        return self._roll(self.variables, images, noises, states,
                          no_pipeline(self.steps))


class Detections:
    """Inference results container — the reference's hub Detections object
    (reference yolov3/models/common.py:708-837): per-image boxes in ORIGINAL
    image coordinates, with render/save/crop/to_dicts accessors."""

    def __init__(self, ims, xyxy, names, paths=None):
        self.ims = ims            # list of HWC float32 [0,1] originals
        self.xyxy = xyxy          # list of [n, 6] (xyxy, conf, cls)
        self.names = names        # {class_id: name}
        self.paths = paths or [None] * len(ims)

    def __len__(self):
        return len(self.ims)

    def __repr__(self):
        lines = []
        for i, det in enumerate(self.xyxy):
            h, w = self.ims[i].shape[:2]
            counts = {}
            for c in det[:, 5].astype(int):
                counts[c] = counts.get(c, 0) + 1
            body = ", ".join(
                f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}"
                for c, n in sorted(counts.items())) or "(no detections)"
            lines.append(f"image {i}/{len(self)}: {w}x{h} {body}")
        return "\n".join(lines)

    def to_dicts(self):
        """Per-image list of detection dicts (the pandas() analog)."""
        out = []
        for det in self.xyxy:
            out.append([
                {"xmin": float(d[0]), "ymin": float(d[1]),
                 "xmax": float(d[2]), "ymax": float(d[3]),
                 "confidence": float(d[4]), "class": int(d[5]),
                 "name": self.names.get(int(d[5]), str(int(d[5])))}
                for d in det])
        return out

    def render(self):
        """Draw boxes onto copies of the originals; returns uint8 images."""
        from PIL import Image, ImageDraw

        rendered = []
        for im, det in zip(self.ims, self.xyxy):
            pil = Image.fromarray(
                (np.clip(im, 0, 1) * 255).astype(np.uint8))
            draw = ImageDraw.Draw(pil)
            for d in det:
                c = int(d[5])
                color = tuple(int(v) for v in (
                    37 * (c + 1) % 256, 91 * (c + 3) % 256,
                    53 * (c + 7) % 256))
                draw.rectangle(list(map(float, d[:4])), outline=color,
                               width=2)
                draw.text((float(d[0]) + 2, float(d[1]) + 2),
                          f"{self.names.get(c, c)} {d[4]:.2f}", fill=color)
            rendered.append(np.asarray(pil))
        return rendered

    def save(self, save_dir: str = "runs/hub"):
        import os

        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)
        outs = []
        for i, arr in enumerate(self.render()):
            name = (f"image{i}.png" if self.paths[i] is None else
                    os.path.split(self.paths[i])[1])
            p = os.path.join(save_dir, name)
            Image.fromarray(arr).save(p)
            outs.append(p)
        return outs

    def crop(self, save_dir: Optional[str] = None):
        """Per-detection crops (reference Detections.crop)."""
        crops = []
        for im, det in zip(self.ims, self.xyxy):
            h, w = im.shape[:2]
            for d in det:
                x1, y1, x2, y2 = (max(0, int(d[0])), max(0, int(d[1])),
                                  min(w, int(np.ceil(d[2]))),
                                  min(h, int(np.ceil(d[3]))))
                crops.append({"im": im[y1:y2, x1:x2].copy(),
                              "cls": int(d[5]), "conf": float(d[4])})
        if save_dir is not None:
            import os

            from PIL import Image

            os.makedirs(save_dir, exist_ok=True)
            for i, c in enumerate(crops):
                Image.fromarray(
                    (np.clip(c["im"], 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(save_dir, f"crop{i}_cls{c['cls']}.png"))
        return crops


@dataclasses.dataclass
class Detector:
    model: Any
    variables: Any
    spec: Any = None
    names: Any = None
    augment: bool = False  # TTA (reference hubconf autoshape augment flag)

    def __post_init__(self):
        from adaptiveisp_tpu.detect.model import decode_predictions

        if hasattr(self.model, "apply_decoded"):
            # DetectorEnsemble: members decode per-spec inside one jit and
            # concatenate candidates (reference experimental.py:64-69)
            if self.augment:
                raise ValueError(
                    "augment=True (TTA) is not supported for NMS "
                    "ensembles — run TTA per member instead")
            self._fwd = jax.jit(
                lambda v, x: self.model.apply_decoded(v, x))
        elif self.augment:
            from adaptiveisp_tpu.detect.tta import forward_augment

            self._fwd = jax.jit(lambda v, x: forward_augment(
                lambda xi: self.model.apply(v, xi, train=False), x,
                self.spec))
        else:
            self._fwd = jax.jit(lambda v, x: decode_predictions(
                self.model.apply(v, x, train=False), self.spec))
        if self.names is None:
            from adaptiveisp_tpu.data.dataset_config import COCO_NAMES

            self.names = dict(enumerate(COCO_NAMES))

    def detect(self, images, conf_thres: float = 0.25,
               iou_thres: float = 0.45, max_det: int = 300,
               multi_label: bool = False, classes=None,
               agnostic: bool = False):
        from adaptiveisp_tpu.detect.nms import non_max_suppression

        preds = self._fwd(self.variables, jnp.asarray(images, jnp.float32))
        return non_max_suppression(
            preds, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, multi_label=multi_label,
            classes=(tuple(classes) if classes is not None else None),
            agnostic=agnostic)

    # ------------------------------------------------------------------ #
    def __call__(self, sources, size: int = 512, conf_thres: float = 0.25,
                 iou_thres: float = 0.45, max_det: int = 300,
                 multi_label: bool = False, classes=None,
                 agnostic: bool = False) -> Detections:
        """AutoShape-style inference (reference common.py:623-705): accepts
        a path / numpy HWC image / PIL image or a list of them, handles
        letterboxing and coordinate restoration internally."""
        from adaptiveisp_tpu.data.letterbox import letterbox
        from adaptiveisp_tpu.detect.boxes import scale_boxes

        if not isinstance(sources, (list, tuple)):
            sources = [sources]
        ims, paths = [], []
        for s in sources:
            path = None
            if isinstance(s, str):
                from adaptiveisp_tpu.data.datasets import load_image_file

                path, s = s, load_image_file(s)
            elif hasattr(s, "convert"):  # PIL image
                s = np.asarray(s.convert("RGB"), np.float32) / 255.0
            else:
                s = np.asarray(s)
                if s.dtype == np.uint8:
                    s = s.astype(np.float32) / 255.0
            ims.append(s)
            paths.append(path)

        batch, metas = [], []
        for im in ims:
            lb, ratio, pad = letterbox(im, size, color=(0, 0, 0), auto=False)
            batch.append(lb)
            metas.append((im.shape[:2], (ratio, pad)))
        dets, nvalid = self.detect(
            np.stack(batch, 0), conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, multi_label=multi_label, classes=classes,
            agnostic=agnostic)
        dets = np.array(dets)
        nvalid = np.asarray(nvalid)

        per_image = []
        for i, ((h0, w0), ratio_pad) in enumerate(metas):
            d = dets[i][:int(nvalid[i])].copy()
            if d.shape[0]:
                d[:, :4] = scale_boxes((size, size), d[:, :4], (h0, w0),
                                       ratio_pad)
            per_image.append(d)
        return Detections(ims, per_image, self.names, paths)


def load_adaptive_isp(agent_ckpt: Optional[str] = None,
                      cfg: Config = DEFAULT_CONFIG, imgsz: int = 512,
                      steps: int = 5, seed: int = 0) -> AdaptiveISP:
    from adaptiveisp_tpu.policy.agent import create_agent_state

    agent, variables = create_agent_state(
        cfg, jax.random.PRNGKey(seed), image_size=imgsz, batch=1)
    if agent_ckpt:
        from adaptiveisp_tpu.train import checkpoint as ckpt_lib

        variables = ckpt_lib.load_weights_only(agent_ckpt)["agent_model"]
    return AdaptiveISP(cfg, agent, variables, steps=steps)


def load_detector(weights=None, spec=None, nc: Optional[int] = None,
                  seed: int = 0, names=None,
                  augment: bool = False) -> Detector:
    """Build a :class:`Detector` from weights.

    Mirrors the reference's ``attempt_load`` list behaviour
    (/root/reference/yolov3/models/experimental.py:73-111): a list of
    weight paths produces an NMS ensemble whose candidates are merged
    before a single NMS.  ``spec`` may then be a matching list (one spec
    per member) or a single spec shared by all members.
    """
    from adaptiveisp_tpu.detect.model import create_detector

    if isinstance(weights, (list, tuple)) and len(weights) > 1:
        from adaptiveisp_tpu.detect.ensemble import DetectorEnsemble
        from train_isp import load_yolo_variables

        specs = (list(spec) if isinstance(spec, (list, tuple))
                 else [spec] * len(weights))
        if len(specs) != len(weights):
            raise ValueError(
                f"{len(weights)} weights but {len(specs)} specs")
        members, var_list = [], []
        for w, s in zip(weights, specs):
            model, variables = create_detector(
                jax.random.PRNGKey(seed), spec=s, nc=nc, imgsz=256)
            loaded = load_yolo_variables(w) if w else None
            members.append((model, s))
            var_list.append(loaded if loaded is not None else variables)
        ens = DetectorEnsemble(members)
        return Detector(ens, tuple(var_list), spec=specs[0], names=names)

    if isinstance(weights, (list, tuple)):
        weights = weights[0] if weights else None
    model, variables = create_detector(
        jax.random.PRNGKey(seed), spec=spec, nc=nc, imgsz=256)
    if weights:
        from train_isp import load_yolo_variables

        loaded = load_yolo_variables(weights)
        if loaded is not None:
            variables = loaded
    return Detector(model, variables, spec=spec, names=names,
                    augment=augment)


def load_value(cfg: Config = DEFAULT_CONFIG, imgsz: int = 512, seed: int = 0):
    from adaptiveisp_tpu.policy.value import create_value_state

    return create_value_state(cfg, jax.random.PRNGKey(seed),
                              image_size=imgsz, batch=1)


# --------------------------------------------------------------------------- #
# hubconf-style named constructors (reference hubconf.py:68-135): each is a
# one-call AutoShape model over a named spec; `custom(path)` loads any
# checkpoint this framework writes (or a torch .pt, converted on load).
# --------------------------------------------------------------------------- #
def _named(spec_name, weights=None, classes: int = 80, augment: bool = False,
           names=None) -> Detector:
    from adaptiveisp_tpu.detect.spec import resolve_spec

    spec = resolve_spec(spec_name)
    nc = None if classes == spec["nc"] else classes
    return load_detector(weights=weights, spec=spec, nc=nc, names=names,
                         augment=augment)


def yolov3(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov3", weights, classes, **kw)


def yolov3_tiny(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov3-tiny", weights, classes, **kw)


def yolov3_spp(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov3-spp", weights, classes, **kw)


def yolov5n(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5n", weights, classes, **kw)


def yolov5s(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5s", weights, classes, **kw)


def yolov5m(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5m", weights, classes, **kw)


def yolov5l(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5l", weights, classes, **kw)


def yolov5x(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5x", weights, classes, **kw)


def yolov5n6(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5n6", weights, classes, **kw)


def yolov5s6(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5s6", weights, classes, **kw)


def yolov5m6(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5m6", weights, classes, **kw)


def yolov5l6(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5l6", weights, classes, **kw)


def yolov5x6(weights=None, classes: int = 80, **kw) -> Detector:
    return _named("yolov5x6", weights, classes, **kw)


def custom(path, spec=None, **kw) -> Detector:
    """reference hubconf.custom: any checkpoint path + optional spec."""
    return load_detector(weights=path, spec=spec, **kw)
