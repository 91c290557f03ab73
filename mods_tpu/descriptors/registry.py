"""Descriptor registry: name -> parameters/behavior.

Mirrors the reference's descriptor dispatch
(imagerepresentation.cpp:1274-1985).  SIFT-family descriptors share the
patch-extraction + histogram machinery; `Pixels` is the normalized raw
patch (descriptors/pixelsdesc.hpp).  Binary descriptors (ORB) live in
`mods_tpu.descriptors.orb`.
"""

from __future__ import annotations

from dataclasses import dataclass

from mods_tpu.config import PatchExtractionParams, SIFTDescriptorParams


@dataclass(frozen=True)
class DescriptorSpec:
    name: str
    kind: str                  # "sift" | "pixels" | "binary"
    sift: SIFTDescriptorParams | None = None
    half_sift_like: bool = False   # uses half-SIFT orientation folding
    dim: int = 128
    dsp_levels: int = 0        # >0 = domain-size pooling (DSP-SIFT)


def sift_spec(name: str, **kw) -> DescriptorSpec:
    p = SIFTDescriptorParams(**kw)
    return DescriptorSpec(name=name, kind="sift", sift=p,
                          half_sift_like=p.half_sift, dim=p.dim)


REGISTRY: dict[str, DescriptorSpec] = {
    "SIFT": sift_spec("SIFT"),
    "RootSIFT": sift_spec("RootSIFT", root_sift=True),
    "HalfSIFT": sift_spec("HalfSIFT", half_sift=True),
    "HalfRootSIFT": sift_spec("HalfRootSIFT", root_sift=True,
                              half_sift=True),
    "MagnLessSIFT": sift_spec("MagnLessSIFT", magn_less=True),
    "DSPSIFT": DescriptorSpec(
        name="DSPSIFT", kind="sift",
        sift=SIFTDescriptorParams(root_sift=True), dim=128, dsp_levels=3),
    "Pixels": DescriptorSpec(
        name="Pixels", kind="pixels",
        sift=SIFTDescriptorParams(), dim=41 * 41),
    "ORB": DescriptorSpec(name="ORB", kind="binary", dim=256),
    # patch-functor descriptors (descriptors/*.hpp wrappers); dims from
    # mods_tpu.descriptors.patch_descs.PATCH_DIMS
    "SURF": DescriptorSpec(name="SURF", kind="patch", dim=64),
    "LIOP": DescriptorSpec(name="LIOP", kind="patch", dim=144),
    "DAISY": DescriptorSpec(name="DAISY", kind="patch", dim=200),
    "SSIM": DescriptorSpec(name="SSIM", kind="patch", dim=40),
    "KAZE": DescriptorSpec(name="KAZE", kind="patch", dim=64),
    "MLDB": DescriptorSpec(name="MLDB", kind="patch", dim=486),
    "FREAK": DescriptorSpec(name="FREAK", kind="patch", dim=512),
    "BRISK": DescriptorSpec(name="BRISK", kind="patch", dim=512),
    "MROGH": DescriptorSpec(name="MROGH", kind="patch", dim=144),
}


def get_spec(name: str) -> DescriptorSpec:
    if name not in REGISTRY:
        raise KeyError(f"unknown descriptor {name!r}; known: "
                       f"{sorted(REGISTRY)}")
    return REGISTRY[name]
