"""zkinterface bridge: round-trip + FlatBuffers wire-format checks."""

import os

import pytest

from otti_tpu.io import zkif
from tests.test_nizk import random_instance, toy_instance

MOD = zkif.SCALAR.modulus


def test_roundtrip_toy(tmp_path):
    shape, vars_, ios = toy_instance()
    base = str(tmp_path / "toy")
    zkif.export_r1cs(shape, vars_, ios, base)
    for ext in (".zkif", ".inp.zkif", ".wit.zkif"):
        assert os.path.exists(base + ext)
    shape2, vars2, ios2 = zkif.import_r1cs(base + ".zkif", base + ".wit.zkif")
    assert shape2.num_cons == shape.num_cons
    assert shape2.num_vars == shape.num_vars
    assert shape2.num_inputs == shape.num_inputs
    assert vars2 == [v % MOD for v in vars_]
    assert ios2 == [v % MOD for v in ios]
    assert shape2.is_satisfied(vars2, ios2)
    # same constraints up to ordering
    assert sorted(shape2.A) == sorted(shape.A)
    assert sorted(shape2.B) == sorted(shape.B)
    assert sorted(shape2.C) == sorted(shape.C)


def test_roundtrip_reference_triple(tmp_path):
    """3-file spzk surface: inputs taken from the separate .inp.zkif."""
    shape, vars_, ios = toy_instance()
    base = str(tmp_path / "toy")
    zkif.export_r1cs(shape, vars_, ios, base)
    # rewrite the circuit file's header with zeroed inputs, as a reference
    # toolchain may do — the .inp.zkif must then be authoritative
    with open(base + ".zkif", "rb") as f:
        circ = f.read()
    hdr = zkif.write_circuit_header(
        shape.num_inputs, [0] * shape.num_inputs,
        1 + shape.num_inputs + shape.num_vars,
    )
    msgs = list(zkif.read_messages(circ))
    assert msgs[0][0] == zkif.MSG_CIRCUIT_HEADER
    # header is the first length-prefixed message; splice in the zeroed one
    import struct

    first_len = struct.unpack("<I", circ[:4])[0] + 4
    with open(base + ".zeroed.zkif", "wb") as f:
        f.write(hdr + circ[first_len:])
    shape2, vars2, ios2 = zkif.import_r1cs(
        base + ".zeroed.zkif", base + ".wit.zkif", base + ".inp.zkif"
    )
    assert ios2 == [v % MOD for v in ios]
    assert shape2.is_satisfied(vars2, ios2)


def test_roundtrip_random(tmp_path):
    shape, zvars, inputs = random_instance(9, 6, 2, seed=5)
    base = str(tmp_path / "rnd")
    zkif.export_r1cs(shape, zvars, inputs, base)
    shape2, vars2, ios2 = zkif.import_r1cs(base + ".zkif", base + ".wit.zkif")
    assert shape2.is_satisfied(vars2, ios2)
    assert sorted(shape2.A) == sorted(shape.A)


def test_flatbuffers_lib_can_read_our_output(tmp_path):
    """Cross-check the hand-rolled writer with the flatbuffers runtime."""
    flatbuffers = pytest.importorskip("flatbuffers")
    import flatbuffers.table
    import flatbuffers.number_types as N

    shape, vars_, ios = toy_instance()
    base = str(tmp_path / "fb")
    zkif.export_r1cs(shape, vars_, ios, base)
    data = open(base + ".wit.zkif", "rb").read()
    size = int.from_bytes(data[:4], "little")
    body = data[4 : 4 + size]
    root_off = int.from_bytes(body[:4], "little")
    tab = flatbuffers.table.Table(bytearray(body), root_off)
    # Root.message_type (slot 0 -> vtable offset 4)
    o = tab.Offset(4)
    assert o != 0
    msg_type = tab.Get(N.Uint8Flags, tab.Pos + o)
    assert msg_type == zkif.MSG_WITNESS
    # Root.message (slot 1 -> vtable offset 6): Witness table
    o = tab.Offset(6)
    wit_pos = tab.Indirect(tab.Pos + o)
    wit = flatbuffers.table.Table(tab.Bytes, wit_pos)
    o = wit.Offset(4)  # assigned_variables
    vars_tab = flatbuffers.table.Table(tab.Bytes, wit.Indirect(wit.Pos + o))
    o = vars_tab.Offset(4)  # variable_ids vector
    n = vars_tab.VectorLen(o)
    assert n == shape.num_vars
    first_id = vars_tab.Get(
        N.Uint64Flags, vars_tab.Vector(o)
    )
    assert first_id == 1 + shape.num_inputs


def test_proof_serialization_roundtrip(tmp_path):
    from otti_tpu.spartan import nizk, serial

    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = nizk.prove(dev, vars_, ios)
    path = str(tmp_path / "p.proof.json")
    serial.save(proof, path)
    loaded = serial.load(path)
    assert nizk.verify(dev, ios, loaded)
    assert serial.dumps(loaded) == serial.dumps(proof)


def test_zk_proof_serialization_roundtrip(tmp_path):
    from otti_tpu.spartan import serial, zknizk

    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = zknizk.prove(dev, vars_, ios, seed=b"\x09" * 32)
    loaded = serial.loads(serial.dumps(proof))
    assert zknizk.verify(dev, ios, loaded)
