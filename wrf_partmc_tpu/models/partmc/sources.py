"""Source / weight-class universe discovery.

TPU-native equivalent of ``get_sources_and_weights``
(``/root/reference/interface/wrf_pmc_init.F90:1291-1431``): the reference
walks every IC, BC and emission mode, registers each distinct source name,
assigns each source its own weight class, and appends two hardcoded sea-salt
classes — producing the ~40-class universe whose per-class NUM_CONC tracers
WRF advects (``registry.partmc_trans``).

Here the same discovery runs over named :class:`AeroDist` inputs at setup
time and rewrites their per-mode ``source``/``w_class`` arrays with the
assigned ids; ``Config.n_class`` must be >= ``universe.n_class`` (validated).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp

from .dist import AeroDist

SEASALT_CLASSES = ("seasalt_film", "seasalt_spume")   # the 2 hardcoded
                                                      # classes, :1405-1417


@dataclass(frozen=True)
class SourceUniverse:
    """Registry of discovered sources and their weight classes."""

    sources: tuple          # source names, id = index
    classes: tuple          # weight-class names, id = index
    source_class: tuple     # weight-class id per source id

    @property
    def n_source(self) -> int:
        return len(self.sources)

    @property
    def n_class(self) -> int:
        return len(self.classes)

    def source_id(self, name: str) -> int:
        return self.sources.index(name)


def build_universe(ic=(), bc=(), emissions=(), seasalt: bool = False):
    """Discover the source/weight-class universe and rewrite the dists.

    ic / bc / emissions: sequences of (name, AeroDist).  Every named input
    becomes one source with its own weight class (the reference's
    per-source FLAT_SPECIFIED weighting); sea salt appends its two classes
    sharing one 'seasalt' source.

    Returns (universe, ic_dists, bc_dists, emit_dists) where the dists carry
    the assigned source/w_class ids on every mode.
    """
    sources: list = []
    classes: list = []
    source_class: list = []

    def register(name):
        if name in sources:
            return sources.index(name)
        sources.append(name)
        classes.append(name)
        source_class.append(classes.index(name))
        return len(sources) - 1

    def assign(named):
        out = []
        for name, dist in named:
            sid = register(name)
            cid = source_class[sid]
            m = dist.num_conc.shape[-1]
            out.append(dataclasses.replace(
                dist,
                source=jnp.full((m,), sid, jnp.int32),
                w_class=jnp.full((m,), cid, jnp.int32)))
        return tuple(out)

    ic_d = assign(ic)
    bc_d = assign(bc)
    em_d = assign(emissions)
    if seasalt:
        sid = register("seasalt")
        # sea salt gets a second class (film vs spume split by size at
        # sampling time); both map to the same source
        classes.append("seasalt_spume")
        source_class[sid] = classes.index("seasalt")
    uni = SourceUniverse(sources=tuple(sources), classes=tuple(classes),
                         source_class=tuple(source_class))
    return uni, ic_d, bc_d, em_d


def validate_universe(uni: SourceUniverse, n_class_cfg: int) -> None:
    if uni.n_class > n_class_cfg:
        raise ValueError(
            f"universe has {uni.n_class} weight classes "
            f"({uni.classes}) but Config.n_class={n_class_cfg}; raise "
            f"n_class (NUM_CONC tracer count, reference supports 40)")
