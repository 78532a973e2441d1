"""shard_map wrappers: subgrid-batch data parallelism + grid collectives.

Design (SURVEY.md §2.7): the subgrid axis is embarrassingly parallel (the
reference maps it to `blockIdx.x`); here it shards over the mesh's "data"
axis. Every per-subgrid array (uvw, visibilities, metadata, subgrids) splits
on axis 0; wavenumbers/spheroidal/aterms replicate. The master-grid
accumulation — absent from the reference — is a local scatter-add followed by
an XLA `psum` over ICI (replicated grid) or `psum_scatter` (row-sharded grid).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import IDGParams
from ..types import Metadata, SplitObservation
from ..ops.grid import grid_to_subgrids, subgrids_to_grid
from ..ops.registry import get_kernel
from .mesh import pad_axis0, pad_to_multiple


def _obs_specs(axis: str) -> SplitObservation:
    """SplitObservation pytree of PartitionSpecs: subgrid axis sharded."""
    s = P(axis)
    r = P()
    md = Metadata(*([s] * len(dataclasses.fields(Metadata))))
    return SplitObservation(
        uvw=s, wavenumbers=r, vis_re=s, vis_im=s,
        spheroidal=r, at_re=r, at_im=r, metadata=md,
    )


def _localize_time_offset(sobs: SplitObservation, params: IDGParams, axis: str):
    """Rebase global flat-time offsets to this shard's local buffer.

    time_offset indexes the flat (subgrid*T) axis of uvw/visibilities
    (types.Metadata docstring); sharding splits that buffer, so subtract the
    shard's first global row. Valid because each subgrid's timesteps live in
    its own rows (the in-tree layout, init.cpp:134-159).
    """
    s_loc = sobs.uvw.shape[0]
    start = jax.lax.axis_index(axis) * s_loc * params.nr_timesteps_subgrid
    md = sobs.metadata
    md = dataclasses.replace(md, time_offset=md.time_offset - start)
    return dataclasses.replace(sobs, metadata=md)


def shard_observation(params: IDGParams, sobs: SplitObservation, mesh: Mesh):
    """Pad the subgrid axis to the mesh size and device_put with the
    distributed sharding. Returns (sharded_sobs, padded_S)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    s = sobs.uvw.shape[0]
    s_pad = pad_to_multiple(s, n_dev)
    t = params.nr_timesteps_subgrid

    md = sobs.metadata
    pad_n = s_pad - s
    if pad_n:
        extra_offsets = (np.arange(s, s_pad, dtype=np.int32)) * t
        md = Metadata(
            time_offset=np.concatenate([np.asarray(md.time_offset), extra_offsets]),
            nr_timesteps=pad_axis0(md.nr_timesteps, s_pad),
            aterm_index=pad_axis0(md.aterm_index, s_pad),
            station1=pad_axis0(md.station1, s_pad),
            station2=pad_axis0(md.station2, s_pad),
            coord_x=pad_axis0(md.coord_x, s_pad),
            coord_y=pad_axis0(md.coord_y, s_pad),
            coord_z=pad_axis0(md.coord_z, s_pad),
        )
    padded = SplitObservation(
        uvw=pad_axis0(sobs.uvw, s_pad),
        wavenumbers=np.asarray(sobs.wavenumbers),
        vis_re=pad_axis0(sobs.vis_re, s_pad),
        vis_im=pad_axis0(sobs.vis_im, s_pad),
        spheroidal=np.asarray(sobs.spheroidal),
        at_re=np.asarray(sobs.at_re),
        at_im=np.asarray(sobs.at_im),
        metadata=md,
    )
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), _obs_specs(axis),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(padded, shardings), s_pad


def sharded_gridder(params: IDGParams, mesh: Mesh, version: str = "xla_v2"):
    """jitted fn(sobs_sharded) -> (re, im) subgrids, sharded on axis 0."""
    axis = mesh.axis_names[0]
    kernel = get_kernel("gridder", version).fn
    specs = _obs_specs(axis)

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(specs,),
        out_specs=(P(axis), P(axis)), check_vma=False,
    )
    def local(sobs):
        return kernel(params, _localize_time_offset(sobs, params, axis))

    return jax.jit(local)


def sharded_degridder(params: IDGParams, mesh: Mesh, version: str = "xla_v2"):
    """jitted fn(sobs_sharded, sub_pair) -> (re, im) visibilities."""
    axis = mesh.axis_names[0]
    kernel = get_kernel("degridder", version).fn
    specs = _obs_specs(axis)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(specs, (P(axis), P(axis))),
        out_specs=(P(axis), P(axis)), check_vma=False,
    )
    def local(sobs, sub):
        return kernel(params, _localize_time_offset(sobs, params, axis), sub)

    return jax.jit(local)


def sharded_gridder_to_grid(
    params: IDGParams,
    mesh: Mesh,
    version: str = "xla_v2",
    apply_fft: bool = True,
    grid_sharded: bool = False,
):
    """jitted fn(sobs_sharded) -> [P, G, G] grid pair.

    Full adjoint pipeline across the mesh: local gridder → local subgrid
    iFFT + scatter-add → collective reduction. `grid_sharded=False` returns
    the grid replicated via `psum` (hierarchical ICI reduction, XLA-chosen);
    `grid_sharded=True` returns each chip's row-block via `psum_scatter`
    (bandwidth-optimal when the grid stays distributed).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    kernel = get_kernel("gridder", version).fn
    specs = _obs_specs(axis)
    g = params.grid_size
    if grid_sharded:
        assert g % n_dev == 0, "grid rows must divide the mesh for psum_scatter"
    out_spec = (P(None, axis, None),) * 2 if grid_sharded else (P(), P())

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(specs,), out_specs=out_spec,
        check_vma=False,
    )
    def local(sobs):
        sobs = _localize_time_offset(sobs, params, axis)
        sub = kernel(params, sobs)
        grid = subgrids_to_grid(
            sub, sobs.metadata.coord_x, sobs.metadata.coord_y, g, apply_fft
        )
        if grid_sharded:
            return tuple(
                jax.lax.psum_scatter(
                    x.reshape(x.shape[0], n_dev, g // n_dev, g),
                    axis, scatter_dimension=1, tiled=False,
                ).reshape(x.shape[0], g // n_dev, g)
                for x in grid
            )
        return tuple(jax.lax.psum(x, axis) for x in grid)

    return jax.jit(local)


def sharded_grid_to_degridder(
    params: IDGParams,
    mesh: Mesh,
    version: str = "xla_v2",
    apply_fft: bool = True,
):
    """jitted fn(sobs_sharded, grid_pair_replicated) -> (re, im) visibilities.

    Forward pipeline: replicated grid → local tile gather + FFT → local
    degridder. The grid gather is local (no collective) because the grid is
    replicated; a sharded-grid variant would all-gather the needed rows.
    """
    axis = mesh.axis_names[0]
    kernel = get_kernel("degridder", version).fn
    specs = _obs_specs(axis)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(specs, (P(), P())),
        out_specs=(P(axis), P(axis)), check_vma=False,
    )
    def local(sobs, grid):
        sobs = _localize_time_offset(sobs, params, axis)
        sub = grid_to_subgrids(
            grid, sobs.metadata.coord_x, sobs.metadata.coord_y,
            params.subgrid_size, apply_fft,
        )
        return kernel(params, sobs, sub)

    return jax.jit(local)
