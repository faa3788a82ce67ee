"""Map reference torch ``state_dict`` checkpoints onto our flax parameter trees.

Key layout of the reference trunks (verified against the on-disk
``model_architecture/*.pth``, SURVEY.md §2.5):

chem (chem/model.py):
  x_embedding{1,2}.weight                         [120|3, D]
  gnns.{k}.mlp.{0,2}.{weight,bias}                GIN MLP
  gnns.{k}.linear.{weight,bias}                   GCN / GraphSAGE
  gnns.{k}.weight_linear.{weight,bias}, att, bias GAT
  gnns.{k}.edge_embedding{1,2}.weight
  batch_norms.{k}.{weight,bias,running_mean,running_var,num_batches_tracked}

bio (bio/model.py): no trunk-level embeddings / batch_norms; convs carry
  edge_encoder.{weight,bias}, conv-0 only input_node_embeddings.weight, and
  bio-GIN MLPs have an internal BatchNorm: mlp.{0,3} Linear + mlp.1 BN.

torch ``Linear.weight`` is [out, in]; flax Dense kernels are [in, out], so
linear weights are transposed on import/export.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# torch Sequential index -> our flax submodule name
_LINEARS = {
    "mlp.0": "mlp_0",
    "mlp.2": "mlp_2",  # chem GIN (Linear, ReLU, Linear)
    "mlp.3": "mlp_3",  # bio GIN  (Linear, BN, ReLU, Linear)
    "linear": "linear",
    "weight_linear": "weight_linear",
    "edge_encoder": "edge_encoder",
    "gate_nn": "gate_nn",
    "graph_pred_linear": "graph_pred_linear",
}
_EMBEDDINGS = (
    "x_embedding1", "x_embedding2",
    "edge_embedding1", "edge_embedding2",
    "input_node_embeddings",
)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _route_leaf(parts, value):
    """Return (collection, path, value) for one torch state-dict entry,
    with ``parts`` already module-scoped (e.g. ['mlp.0','weight'])."""
    head, leaf = ".".join(parts[:-1]), parts[-1]
    # BatchNorm stats inside bio-GIN mlp ("mlp.1") or trunk batch_norms
    if head in ("mlp.1", "") and leaf in (
        "running_mean", "running_var", "num_batches_tracked",
        "weight", "bias",
    ):
        name = "mlp_1" if head == "mlp.1" else None
        if leaf == "num_batches_tracked":
            return None
        coll = {
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
            "weight": ("params", "scale"),
            "bias": ("params", "bias"),
        }[leaf]
        path = (name, coll[1]) if name else (coll[1],)
        return coll[0], path, value
    if head in _LINEARS:
        if leaf == "weight":
            return "params", (_LINEARS[head], "kernel"), value.T
        return "params", (_LINEARS[head], "bias"), value
    if not head and parts[-1] in ("att", "bias"):
        return "params", (parts[-1],), value
    if head in _EMBEDDINGS and leaf == "weight":
        return "params", (head,), value
    raise KeyError(f"unmapped checkpoint key: {'.'.join(parts)}")


def trunk_from_torch(
    state_dict: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Convert a reference trunk ``state_dict`` (chem or bio flavor) into
    flax variables: ``{"params": ..., "batch_stats": ...}``."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        value = np.asarray(value)
        if parts[0] == "gnns":
            scope = (f"gnns_{parts[1]}",)
            rest = parts[2:]
        elif parts[0] == "batch_norms":
            k = parts[1]
            leaf = parts[2]
            if leaf == "num_batches_tracked":
                continue
            mapping = {
                "weight": ("params", "scale"),
                "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var"),
            }
            coll, name = mapping[leaf]
            tgt = params if coll == "params" else stats
            _set(tgt, (f"batch_norms_{k}", name), value)
            continue
        else:
            scope = ()
            rest = parts
        routed = _route_leaf(rest, value)
        if routed is None:
            continue
        coll, path, v = routed
        tgt = params if coll == "params" else stats
        _set(tgt, scope + path, v)
    return {"params": params, "batch_stats": stats}


def load_trunk(path: str) -> Dict[str, Any]:
    """Read a reference ``.pth`` trunk checkpoint into flax variables —
    our ``GNN_graphpred.from_pretrained`` (chem/model.py:354-356)."""
    from pretrain_gnns_tpu.compat.torch_reader import load_torch_checkpoint

    return trunk_from_torch(load_torch_checkpoint(path))


def graphpred_variables_with_trunk(
    model_variables: Dict[str, Any], trunk_variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Overwrite the ``gnn`` sub-tree of freshly-initialized GNNGraphPred
    variables with imported trunk weights (heads stay re-initialized, the
    reference's checkpoint contract, SURVEY.md §3.4)."""
    from pretrain_gnns_tpu.train.pretrain import graft_trunk

    return graft_trunk(model_variables, trunk_variables, ("gnn",))


# --------------------------------------------------------------------------
# Export: our trunk variables -> reference-layout state dict
# --------------------------------------------------------------------------
def trunk_to_torch(variables: Mapping[str, Any]) -> "OrderedDict[str, np.ndarray]":
    """Inverse of :func:`trunk_from_torch` (reference key layout), so
    checkpoints trained here can be consumed by the reference code."""
    inv_lin = {v: k for k, v in _LINEARS.items()}
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()

    def emit(prefix: str, params: Mapping[str, Any], stats: Mapping[str, Any]):
        for name, sub in params.items():
            tkey = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if isinstance(sub, Mapping) and "kernel" in sub:
                tname = inv_lin.get(name, name)
                base = f"{prefix}{tname}" if not prefix else f"{prefix}.{tname}"
                out[f"{base}.weight"] = np.asarray(sub["kernel"]).T
                if "bias" in sub:
                    out[f"{base}.bias"] = np.asarray(sub["bias"])
            elif isinstance(sub, Mapping) and "scale" in sub:
                # batch norm
                bn_name = name.replace("batch_norms_", "batch_norms.")
                bn_name = bn_name.replace("mlp_1", "mlp.1")
                base = f"{prefix}{bn_name}" if not prefix else f"{prefix}.{bn_name}"
                out[f"{base}.weight"] = np.asarray(sub["scale"])
                out[f"{base}.bias"] = np.asarray(sub["bias"])
                st = stats.get(name, {})
                if "mean" in st:
                    out[f"{base}.running_mean"] = np.asarray(st["mean"])
                    out[f"{base}.running_var"] = np.asarray(st["var"])
                    out[f"{base}.num_batches_tracked"] = np.asarray(
                        0, np.int64
                    )
            elif isinstance(sub, Mapping):
                sub_name = name.replace("gnns_", "gnns.")
                pre = f"{prefix}{sub_name}" if not prefix else f"{prefix}.{sub_name}"
                emit(pre, sub, stats.get(name, {}))
            else:  # raw array: embeddings / att / bias
                if name in _EMBEDDINGS:
                    out[f"{tkey}.weight"] = np.asarray(sub)
                else:
                    out[tkey] = np.asarray(sub)

    emit("", variables.get("params", {}), variables.get("batch_stats", {}))
    return out
