"""Spatial mesh partitioning for domain decomposition.

Replaces the reference's METIS k-way partitioning + MeshPartitionInfo
(ref: Reference Project/include/SpatialMesh/SpatialMesh.hpp:638-885 and
MeshPartitioning.hpp:20-330). METIS is not available in this environment, so
the default partitioner is recursive coordinate bisection (RCB) over element
centroids — for the solver's semantics any balanced partition works (the
cross-partition coupling is lagged block-Jacobi either way); partition quality
only affects the interface-exchange volume.

The plan mirrors MeshPartitionInfo's contents as flat padded arrays ready for
per-device consumption:
- owned elements per partition (padded),
- global<->local index maps,
- the global INTERFACE element list (elements with any cross-partition face)
  and per-partition halo references: for each local element face, either a
  local element index or an index into the interface exchange buffer.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def partition_rcb(centroids: np.ndarray, nparts: int) -> np.ndarray:
    """Recursive coordinate bisection: (ne, dim) -> (ne,) part ids in [0, nparts).

    Splits the longest bounding-box axis at the median, recursing with
    proportional part counts (supports non-power-of-two nparts)."""
    ne = len(centroids)
    part = np.zeros(ne, dtype=np.int32)

    def recurse(idx: np.ndarray, lo: int, hi: int):
        n = hi - lo
        if n <= 1:
            part[idx] = lo
            return
        c = centroids[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        n_left = n // 2
        split = int(round(len(idx) * n_left / n))
        order = np.argsort(c[:, axis], kind="stable")
        recurse(idx[order[:split]], lo, lo + n_left)
        recurse(idx[order[split:]], lo + n_left, hi)

    recurse(np.arange(ne), 0, nparts)
    return part


def partition_greedy_graph(neighbor: np.ndarray, nparts: int) -> np.ndarray:
    """Greedy BFS graph-growing partitioner (METIS GROW-style fallback)."""
    ne = neighbor.shape[0]
    target = -(-ne // nparts)
    part = np.full(ne, -1, dtype=np.int32)
    unassigned = set(range(ne))
    for p in range(nparts):
        if not unassigned:
            break
        seed = min(unassigned)
        frontier = [seed]
        count = 0
        while frontier and count < target:
            e = frontier.pop(0)
            if part[e] != -1:
                continue
            part[e] = p
            unassigned.discard(e)
            count += 1
            for nbr in neighbor[e]:
                if nbr >= 0 and part[nbr] == -1:
                    frontier.append(int(nbr))
    for e in list(unassigned):
        part[e] = nparts - 1
    return part


@dataclasses.dataclass
class PartitionPlan:
    """Derived decomposition tables (host, numpy)."""

    part: np.ndarray  # (ne,) owner partition
    nparts: int
    local_elems: np.ndarray  # (P, ne_max) global ids, -1 padded
    local_counts: np.ndarray  # (P,)
    local_of_global: np.ndarray  # (ne,) index within owner partition
    interface: np.ndarray  # (ni,) global ids of interface elements
    iface_of_global: np.ndarray  # (ne,) index into interface, -1 otherwise
    # per-partition per-face neighbor references, aligned with local_elems:
    nbr_local: np.ndarray  # (P, ne_max, nf) local index of neighbor, -1 if n/a
    nbr_iface: np.ndarray  # (P, ne_max, nf) interface-buffer index, -1 if n/a
    # (boundary faces have both == -1)

    @property
    def ne_max(self) -> int:
        return self.local_elems.shape[1]

    @property
    def num_interface(self) -> int:
        return len(self.interface)

    def load_balance(self) -> float:
        """max/avg owned elements (the legacy load-balance report,
        ref: Reference Project/src/PhononBTE/PhononBTE.cpp:107-134)."""
        return float(self.local_counts.max() / self.local_counts.mean())


def build_plan(topo, nparts: int, method: str = "rcb") -> PartitionPlan:
    """topo: mesh.core.MeshTopology."""
    ne, nf = topo.elem_neighbor.shape
    if method == "rcb":
        part = partition_rcb(topo.centroids, nparts)
    elif method == "greedy":
        part = partition_greedy_graph(topo.elem_neighbor, nparts)
    else:
        raise ValueError(f"unknown partition method: {method}")

    counts = np.bincount(part, minlength=nparts)
    ne_max = int(counts.max())
    local_elems = np.full((nparts, ne_max), -1, dtype=np.int32)
    local_of_global = np.full(ne, -1, dtype=np.int32)
    for p in range(nparts):
        elems = np.flatnonzero(part == p)
        local_elems[p, : len(elems)] = elems
        local_of_global[elems] = np.arange(len(elems))

    nbr = topo.elem_neighbor
    nbr_part = np.where(nbr >= 0, part[np.clip(nbr, 0, None)], -1)
    cross = (nbr >= 0) & (nbr_part != part[:, None])
    # interface elements: referenced from another partition
    is_iface = np.zeros(ne, dtype=bool)
    is_iface[np.unique(nbr[cross])] = True
    interface = np.flatnonzero(is_iface).astype(np.int32)
    iface_of_global = np.full(ne, -1, dtype=np.int32)
    iface_of_global[interface] = np.arange(len(interface))

    nbr_local = np.full((nparts, ne_max, nf), -1, dtype=np.int32)
    nbr_iface = np.full((nparts, ne_max, nf), -1, dtype=np.int32)
    for p in range(nparts):
        elems = local_elems[p][local_elems[p] >= 0]
        for li, e in enumerate(elems):
            for f in range(nf):
                n = nbr[e, f]
                if n < 0:
                    continue
                if part[n] == p:
                    nbr_local[p, li, f] = local_of_global[n]
                else:
                    nbr_iface[p, li, f] = iface_of_global[n]

    return PartitionPlan(
        part=part,
        nparts=nparts,
        local_elems=local_elems,
        local_counts=counts.astype(np.int32),
        local_of_global=local_of_global,
        interface=interface,
        iface_of_global=iface_of_global,
        nbr_local=nbr_local,
        nbr_iface=nbr_iface,
    )
