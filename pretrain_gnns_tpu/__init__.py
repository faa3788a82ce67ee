"""pretrain_gnns_tpu — TPU-native framework for pre-training Graph Neural Networks.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
snap-stanford/pretrain-gnns (Hu et al., ICLR 2020): molecular (chem) and
protein (bio) GNN pre-training with four self-supervised objectives
(attribute masking, edge prediction, context prediction, Deep Graph Infomax),
supervised pre-training, and downstream fine-tuning — built TPU-first:

- static-shape packed graph batches (no dynamic PyG mega-graphs),
- segment-reduction message passing on the MXU/VPU (Pallas kernels for the
  gather/scatter hot loop),
- SPMD scaling via jax.sharding Mesh + shard_map (data parallel and
  edge-partitioned halo exchange), not NCCL-style collectives.
"""

__version__ = "0.1.0"

from pretrain_gnns_tpu.core.graphs import PackedGraphs, pack_graphs  # noqa: F401
