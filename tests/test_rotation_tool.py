"""Unit tests for scripts/check_rotation.py's pure evaluator — the
pre-/post-artifact x normal/simulate matrix (VERDICT r16 ask #3).

Round 16's finding: --simulate-next modeled "the driver drops
CORRECTNESS_r{upcoming} containing _PROMOTE" unconditionally, so once
that artifact actually landed the mode simulated a SECOND artifact
with the same keys — a state that can never occur — and flagged the
documented grace case with a phantom gap. These tests reconstruct
both states with a synthetic 200-entry registry shaped exactly like
the real one (four rowed tiers + a never-rowed addition + a retired
name) and pin that BOTH modes exit clean in BOTH states, plus the
violation cases stay violations.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_rotation",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_rotation.py"),
)
check_rotation = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_rotation)  # type: ignore[union-attr]
evaluate = check_rotation.evaluate


@pytest.fixture()
def world():
    """The round-17 shape: tiers rowed r13..r16, one never-rowed
    addition queued at _DEMOTE's head's +1, one retired name."""
    w13 = [f"q13_{i:02d}" for i in range(50)]
    w14 = [f"q14_{i:02d}" for i in range(50)]
    w15 = [f"q15_{i:02d}" for i in range(49)]
    w16 = [f"q16_{i:02d}" for i in range(50)]
    retired = "retired_twin"
    addition = "new_addition"
    registry = set(w13 + w14 + w15 + w16 + [addition])
    assert len(registry) == 200  # cadence 4, like the real registry
    # r17 window: the addition first, then 49 of the r13 tier; the
    # 50th r13 name is displaced to the next window (grace case).
    promote = [addition] + w13[:49]
    demote = [w13[49]] + w14 + w15 + w16
    history = {13: w13, 14: w14, 15: w15 + [retired], 16: w16}
    return promote, demote, registry, history


def test_pre_artifact_normal_mode_green(world):
    promote, demote, registry, history = world
    errors, notes, summary = evaluate(
        promote, demote, list(promote), registry, history, simulate=False
    )
    assert errors == []
    assert notes == []
    assert "retired 1 (retired_twin)" in summary


def test_pre_artifact_simulate_green_with_grace(world):
    # Simulates CORRECTNESS_r17 landing: the displaced r13 name reads
    # gap 5 = cadence+1 but is queued at _DEMOTE's head -> grace.
    promote, demote, registry, history = world
    errors, notes, _ = evaluate(
        promote, demote, list(promote), registry, history, simulate=True
    )
    assert errors == []
    assert notes == []


def test_post_artifact_normal_mode_green(world):
    promote, demote, registry, history = world
    history = dict(history)
    history[17] = list(promote)
    errors, _, _ = evaluate(
        promote, demote, list(promote), registry, history, simulate=False
    )
    assert errors == []


def test_post_artifact_simulate_degrades_with_notice(world):
    # THE round-16 finding: once CORRECTNESS_r17 (== _PROMOTE) has
    # landed, --simulate-next must NOT model a second r18 artifact
    # with the same keys (that flagged the grace entry at a phantom
    # gap 6); it degrades to the normal-mode post-artifact check.
    promote, demote, registry, history = world
    history = dict(history)
    history[17] = list(promote)
    errors, notes, summary = evaluate(
        promote, demote, list(promote), registry, history, simulate=True
    )
    assert errors == []
    assert len(notes) == 1 and "already" in notes[0]
    assert "simulated" not in summary  # degraded to normal-mode rules


def test_grace_requires_queued_next(world):
    # gap == cadence+1 while NOT queued in _DEMOTE[:50] stays a
    # violation: move the grace entry to the back of _DEMOTE.
    promote, demote, registry, history = world
    grace_name = demote[0]
    demote = demote[1:] + [grace_name]
    errors, _, _ = evaluate(
        promote, demote, list(promote), registry, history, simulate=True
    )
    assert any(grace_name in e and "gap 5 > 4" in e for e in errors)


def test_never_rowed_must_be_queued_or_promoted(world):
    # A never-rowed entry buried past _DEMOTE[:50] is a violation in
    # normal mode too (swap the addition out of _PROMOTE).
    promote, demote, registry, history = world
    addition = promote[0]
    promote = promote[1:] + [demote[1]]  # backfill with a r14 name
    demote = [demote[0]] + demote[2:] + [addition]
    errors, _, _ = evaluate(
        promote, demote, list(promote), registry, history, simulate=False
    )
    assert any("never rowed, not queued" in e and addition in e for e in errors)


def test_structural_violations_reported(world):
    promote, demote, registry, history = world
    # overlap + order mismatch
    errors, _, _ = evaluate(
        promote, [promote[0]] + demote, list(reversed(promote)), registry,
        history, simulate=False,
    )
    msgs = "\n".join(errors)
    assert "overlap" in msgs
    assert "first-50 order" in msgs
