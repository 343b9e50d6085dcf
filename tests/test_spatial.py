"""Receptive-field algebra invariants (reference spgan.py:433-457,
base_test_manager.py:86-121)."""
from spgan_tpu.ops.spatial import (
    ConvSpec,
    derive_stitch_geometry,
    in_size_chain,
    out_size_chain,
)

TS101 = [ConvSpec(upsample=u) for u in
         [True, False, True, False, True, False, True, False]]


def test_out_chain_101():
    assert out_size_chain(TS101, 11) == [19, 17, 31, 29, 55, 53, 103, 101]


def test_out_chain_doubled():
    assert out_size_chain(TS101, 22) == [41, 39, 75, 73, 143, 141, 279, 277]


def test_in_chain_roundtrip():
    ins = in_size_chain(TS101, 101)
    assert ins[0] == 11
    # forward through the chain from each input size reaches >= target
    assert out_size_chain(TS101, ins[0])[-1] == 101


def test_stitch_geometry():
    g = derive_stitch_geometry(TS101, 11)
    assert g.pixelspace_step == 96
    assert g.latentspace_step == 6
    assert g.outfeat_sizes == (19, 17, 31, 29, 55, 53, 103, 101)
    # per-layer displacement units [2,2,4,4,8,8,16,16] * 6
    assert g.outfeat_steps == (12, 12, 24, 24, 48, 48, 96, 96)


def test_res197_chain():
    ts197 = TS101 + [ConvSpec(upsample=True), ConvSpec(upsample=False)]
    assert out_size_chain(ts197, 11)[-1] == 197
