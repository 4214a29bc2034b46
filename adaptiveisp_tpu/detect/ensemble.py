"""NMS-ensemble inference over multiple detection models.

TPU-native counterpart of the reference's ``Ensemble`` container and the
list form of ``attempt_load`` (/root/reference/yolov3/models/experimental.py:
59-69, 73-111): each member model's decoded candidate boxes are concatenated
along the candidate axis and a single shared NMS runs over the union (the
"nms ensemble", experimental.py:68).

Design differences from the reference (deliberate, TPU-first):

- All member forwards live in ONE jitted graph — XLA schedules the member
  convolutions back-to-back (and can overlap them) with no host round-trip
  between members, where the reference loops Python modules.
- Members may use different specs (depth / anchors / head count) but must
  agree on the class count, mirroring the reference's assert
  (experimental.py:110).
- ``names``/``nc`` come from the first member and the reported stride is the
  maximum over members (experimental.py:106-109).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp

from adaptiveisp_tpu.detect.model import decode_predictions, model_strides
from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC


class DetectorEnsemble:
    """Bundle of ``(model, spec)`` members evaluated as one decoded forward.

    Use :meth:`apply_decoded` with a tuple of member variable pytrees; the
    :class:`adaptiveisp_tpu.api.Detector` front-end recognises this class and
    routes its jitted forward through it, so ``Detector.detect`` /
    ``__call__`` (AutoShape-style) work unchanged on an ensemble.
    """

    def __init__(self, members: Sequence[Tuple[Any, Any]]):
        if not members:
            raise ValueError("ensemble needs at least one (model, spec) member")
        self.members: List[Tuple[Any, Any]] = [
            (m, s or YOLOV3_SPEC) for m, s in members]
        ncs = [s["nc"] for _, s in self.members]
        if len(set(ncs)) != 1:
            # reference experimental.py:110
            raise ValueError(f"Models have different class counts: {ncs}")
        self.nc = ncs[0]
        # max stride over members (reference experimental.py:109)
        self.stride = max(max(model_strides(s)) for _, s in self.members)

    def __len__(self) -> int:
        return len(self.members)

    def apply_decoded(self, variables: Sequence[Any], x: jnp.ndarray):
        """Decoded candidates ``[N, sum_i M_i, 5 + nc]`` over all members.

        ``variables`` is a tuple aligned with ``members``; the concat along
        the candidate axis is the reference's ``torch.cat(y, 1)``
        (experimental.py:68) — NMS then de-duplicates across members.
        """
        if len(variables) != len(self.members):
            raise ValueError(
                f"got {len(variables)} variable trees for "
                f"{len(self.members)} members")
        outs = []
        for (model, spec), v in zip(self.members, variables):
            preds = model.apply(v, x, train=False)
            outs.append(decode_predictions(preds, spec))
        return jnp.concatenate(outs, axis=1)
