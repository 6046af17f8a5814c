"""Keras model-artifact interop: import dense-head weights into the lane.

The reference scores each camera frame with three small Keras
``Sequential`` dense heads loaded from ``.h5`` artifacts
(reference estimate_queue.py:24-28, load_model_file :64-69;
station_41_queue_end_pos/queue_lanes/queue_full). The artifacts
themselves are absent upstream (.MISSING_LARGE_BLOBS:1-3), so exact
numeric parity is unobtainable by anyone — but a user migrating from the
reference HAS those files, and this module is the bridge: their weight
arrays run unchanged through the Spark lane.

Two loaders, one scoring path:

- :func:`load_npz_weights` — the portable form. Extract once in any
  tensorflow-equipped environment::

      m = tensorflow.keras.models.load_model("station_41_queue_full.h5")
      arrs = {}
      for i, layer in enumerate(w for l in m.layers
                                for w in [l.get_weights()] if w):
          arrs[f"layer{i}_W"], arrs[f"layer{i}_b"] = layer
      numpy.savez("station_41_queue_full.npz", **arrs)

- :func:`load_h5_weights` — reads the ``.h5`` directly where ``h5py`` is
  installed (optional import; this container has none). Handles the
  Keras ``model_weights/<name>/<name>/{kernel,bias}:0`` layout and the
  flat ``<name>/{kernel,bias}:0`` variant.

Scoring is a forward pass (dense → activation, linear final layer)
evaluated BATCH-AT-A-TIME in a vectorized pandas UDF: the weight
matrices ride to executors once via closure capture (Spark broadcasts
the serialized UDF), and each Arrow batch is one numpy matmul chain —
the external-model-scoring surface where Python is the declared,
appropriate tool (same rule as the VGG16 featurizer lane). For the
degenerate single-dense-layer (pure linear) head this reproduces MLlib
LinearRegressionModel scoring exactly, which is what the round-trip
test pins.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

Layers = list[tuple[np.ndarray, np.ndarray]]


def load_npz_weights(path: str) -> Layers:
    """``layer{i}_W``/``layer{i}_b`` npz → [(W, b), ...] in layer order."""
    with np.load(path) as z:
        n = sum(1 for k in z.files if k.endswith("_W"))
        layers = []
        for i in range(n):
            layers.append(
                (
                    np.asarray(z[f"layer{i}_W"], dtype=np.float64),
                    np.asarray(z[f"layer{i}_b"], dtype=np.float64),
                )
            )
    _validate(layers)
    return layers


def load_h5_weights(path: str) -> Layers:
    """Keras ``.h5`` → [(W, b), ...]. Requires the optional ``h5py``."""
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "h5py is required to read .h5 artifacts directly; extract to "
            "npz instead (see module docstring) in a tensorflow container"
        ) from exc

    layers: Layers = []
    with h5py.File(path, "r") as f:  # pragma: no cover - needs h5py
        root = f["model_weights"] if "model_weights" in f else f
        for name in root.attrs.get("layer_names", list(root)):
            if isinstance(name, bytes):
                name = name.decode()
            g = root[name]
            while hasattr(g, "keys") and "kernel:0" not in g and len(g) == 1:
                g = g[next(iter(g))]
            if hasattr(g, "keys") and "kernel:0" in g:
                layers.append(
                    (
                        np.asarray(g["kernel:0"], dtype=np.float64),
                        np.asarray(g["bias:0"], dtype=np.float64),
                    )
                )
    _validate(layers)
    return layers


def _validate(layers: Layers) -> None:
    if not layers:
        raise ValueError("no dense layers found in artifact")
    for i, (w, b) in enumerate(layers):
        if w.ndim != 2 or b.ndim != 1 or w.shape[1] != b.shape[0]:
            raise ValueError(f"layer {i}: W{w.shape} / b{b.shape} mismatch")
        if i and layers[i - 1][0].shape[1] != w.shape[0]:
            raise ValueError(f"layer {i}: input dim != layer {i-1} output")


def forward(
    x: np.ndarray, layers: Layers, hidden_activation: str = "relu"
) -> np.ndarray:
    """(n, d) batch → (n,) predictions: dense+activation chain, linear
    final layer (the reference heads regress scalars)."""
    act: Callable[[np.ndarray], np.ndarray]
    if hidden_activation == "relu":
        act = lambda z: np.maximum(z, 0.0)  # noqa: E731
    elif hidden_activation == "tanh":
        act = np.tanh
    else:
        raise ValueError(f"unsupported activation {hidden_activation!r}")
    out = np.asarray(x, dtype=np.float64)
    last = len(layers) - 1
    for i, (w, b) in enumerate(layers):
        out = out @ w + b
        if i != last:
            out = act(out)
    if out.ndim == 2 and out.shape[1] == 1:
        out = out[:, 0]
    return out


def score_imported(
    df: DataFrame,
    heads: dict[str, Layers],
    embedding_col: str = "embedding",
    hidden_activation: str = "relu",
) -> DataFrame:
    """Add one ``pred_<head>`` double column per imported head.

    Drop-in replacement for :func:`ml.models.score` when the model comes
    from reference artifacts instead of an MLlib fit — the downstream
    estimator chain (clamp → interp-join → gate) is unchanged.
    """
    for name, layers in heads.items():
        _validate(layers)

        def make_udf(captured: Layers):
            @F.pandas_udf(DoubleType())
            def predict(emb: pd.Series) -> pd.Series:
                x = np.vstack(emb.to_numpy())
                return pd.Series(forward(x, captured, hidden_activation))

            return predict

        df = df.withColumn(f"pred_{name}", make_udf(layers)(F.col(embedding_col)))
    return df


def from_linear_regression(model) -> Layers:
    """MLlib LinearRegressionModel → single-dense-layer Keras-shaped
    weights — the inverse bridge, used by tests to prove the two scoring
    paths are numerically identical for linear heads."""
    w = np.asarray(model.coefficients, dtype=np.float64).reshape(-1, 1)
    b = np.asarray([float(model.intercept)], dtype=np.float64)
    return [(w, b)]
