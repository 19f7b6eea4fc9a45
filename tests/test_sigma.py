"""Sigma protocols: completeness + simple soundness probes (host-only)."""

import dataclasses

from otti_tpu.refimpl import numeric as ref
from otti_tpu.spartan import sigma
from otti_tpu.spartan.pedersen_host import BlindSource, Gens, commit
from otti_tpu.transcript.merlin import Transcript

L = ref.L
GENS = Gens(8, b"test-sigma")
RNG = lambda tag: BlindSource(b"seed" + tag)


def test_knowledge_proof():
    t = Transcript(b"t")
    proof, C = sigma.KnowledgeProof.prove(t, GENS, 12345, 999, RNG(b"k"))
    assert proof.verify(Transcript(b"t"), GENS, C)
    # wrong commitment fails
    C2 = commit(12346, 999, GENS)
    assert not proof.verify(Transcript(b"t"), GENS, C2)


def test_equality_proof():
    t = Transcript(b"t")
    proof, C1, C2 = sigma.EqualityProof.prove(t, GENS, 77, 11, 22, RNG(b"e"))
    assert proof.verify(Transcript(b"t"), GENS, C1, C2)
    C3 = commit(78, 22, GENS)
    assert not proof.verify(Transcript(b"t"), GENS, C1, C3)


def test_product_proof():
    t = Transcript(b"t")
    proof, Cx, Cy, Cz = sigma.ProductProof.prove(
        t, GENS, 6, 1, 7, 2, 3, RNG(b"p")
    )
    assert proof.verify(Transcript(b"t"), GENS, Cx, Cy, Cz)
    Cbad = commit(43, 3, GENS)
    assert not proof.verify(Transcript(b"t"), GENS, Cx, Cy, Cbad)


def test_dot_product_proof():
    x = [3, 1, 4, 1, 5]
    a = [2, 7, 1, 8, 2]
    y = sum(xi * ai for xi, ai in zip(x, a)) % L
    t = Transcript(b"t")
    proof, Cx, Cy = sigma.DotProductProof.prove(
        t, GENS, x, 123, a, y, 456, RNG(b"d")
    )
    assert proof.verify(Transcript(b"t"), GENS, a, Cx, Cy)
    # wrong claimed value
    Cy_bad = commit((y + 1) % L, 456, GENS)
    assert not proof.verify(Transcript(b"t"), GENS, a, Cx, Cy_bad)
    # tampered response
    bad = dataclasses.replace(proof, z=[(proof.z[0] + 1) % L] + proof.z[1:])
    assert not bad.verify(Transcript(b"t"), GENS, a, Cx, Cy)


def test_transcript_binding():
    """Proof generated under one transcript context fails under another."""
    t = Transcript(b"t")
    t.append_message(b"ctx", b"A")
    proof, C = sigma.KnowledgeProof.prove(t, GENS, 5, 6, RNG(b"k2"))
    t2 = Transcript(b"t")
    t2.append_message(b"ctx", b"B")
    assert not proof.verify(t2, GENS, C)
