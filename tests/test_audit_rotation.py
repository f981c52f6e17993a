"""Audit-staleness CI gate (r12 verdict task 4).

The driver hash-checks the first 50 ids of ``queries()`` order each
round and records the window in ``CORRECTNESS_r{N}.json``; the rotation
protocol (workload.py ``_DRIVER_AUDITED`` maintenance rules 1-5) is what
keeps every id's evidence fresh.  Until now that protocol lived in a
comment — these tests make it mechanical, reading the committed ledger
files so a round that silently stalls the walk (window re-checking
fresh ids while a stale tranche ages out) goes red at HEAD.

Steady state: 291 ids / 50-id windows = a full cycle every 6 rounds, so
the hard bound is age <= 7 (one round of slack for priority/new-id
slots taking window space).  No Spark session needed — ``queries()``
only touches the registries.
"""

import glob
import json
import os
import re

import pytest

import __spark_entry__ as entry
from opl_spark.workload import _AUDIT_PRIORITY, _DRIVER_AUDITED, _RETRY_FIRST

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Steady-state full-cycle length is ceil(291/50)=6 rounds; one round of
#: slack for windows partially spent on retry/priority/new-id slots.
MAX_AGE_ROUNDS = 7

WINDOW = 50


@pytest.fixture(scope="module")
def ledger():
    """{id: last_driver_checked_round} over every committed
    CORRECTNESS_r*.json, plus the newest round number."""
    last: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for qid in json.load(fh):
                last[qid] = max(last.get(qid, 0), rnd)
    assert rounds, "no CORRECTNESS_r*.json ledger found"
    return last, max(rounds)


@pytest.fixture(scope="module")
def order():
    return list(entry.queries())


def test_registry_tuples_are_consistent(order):
    names = set(order)
    audited = list(_DRIVER_AUDITED)
    assert len(audited) == len(set(audited)), "_DRIVER_AUDITED has duplicates"
    unknown = set(audited) - names
    assert not unknown, f"_DRIVER_AUDITED ids not registered: {sorted(unknown)}"
    assert not set(_AUDIT_PRIORITY) & set(_RETRY_FIRST), (
        "an id cannot be both a retry and a priority re-entry"
    )


def test_every_id_is_ledgered_or_leads_the_window(ledger, order):
    """A registered id the driver has NEVER checked must sit inside the
    upcoming 50-id window (new ids lead by construction of
    _audit_order); anything else is an id that can never receive the
    hard signal."""
    last, _ = ledger
    window = set(order[:WINDOW])
    orphans = [q for q in order if q not in last and q not in window]
    assert not orphans, (
        f"never-driver-checked ids outside the upcoming window: {orphans}"
    )


def test_no_id_is_staler_than_the_cycle_bound(ledger, order):
    """Hard bound: every ledgered id's last driver check is at most
    MAX_AGE_ROUNDS behind the newest committed round.  Goes red when
    the rotation stops walking."""
    last, newest = ledger
    stale = {
        q: last[q]
        for q in order
        if q in last and newest - last[q] > MAX_AGE_ROUNDS
    }
    assert not stale, (
        f"ids last driver-checked > {MAX_AGE_ROUNDS} rounds ago "
        f"(newest round r{newest}): {stale}"
    )


def test_upcoming_window_leads_with_the_stalest_ids(ledger, order):
    """The walk must actually walk: every ledgered id at the maximum
    staleness (excluding retry/priority re-entries, which legitimately
    jump the queue regardless of age) must be inside the upcoming
    window — unless there are more such ids than the window's
    non-priority slots, in which case those slots must all be spent on
    max-staleness ids."""
    last, newest = ledger
    jumpers = set(_RETRY_FIRST) | set(_AUDIT_PRIORITY)
    ages = {
        q: newest - last[q] for q in order if q in last and q not in jumpers
    }
    if not ages:
        return
    max_age = max(ages.values())
    stalest = {q for q, a in ages.items() if a == max_age}
    window = order[:WINDOW]
    free_slots = [q for q in window if q not in jumpers and q in last]
    inside = stalest & set(window)
    if len(stalest) <= len(free_slots):
        missing = stalest - inside
        assert not missing, (
            f"stalest ids (age {max_age}) not in the upcoming 50-id "
            f"window: {sorted(missing)}"
        )
    else:
        # more stalest ids than slots: every regression slot must be
        # spent on one of them
        wasted = [q for q in free_slots if q not in stalest]
        assert not wasted, (
            f"window slots spent on fresher ids while age-{max_age} ids "
            f"wait: {wasted}"
        )


def test_survey_inventory_is_generated_and_covers_registry(order):
    """r12 verdict task 8: SURVEY.md §7.5 carries the GENERATED
    inventory — marker-delimited, one row per registered id.  A new
    query without a regenerated survey (or a hand-deleted row) fails
    here; audit-column drift alone does not (the ledger test above
    owns staleness)."""
    import tools.gen_survey_inventory as gen

    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        text = fh.read()
    assert gen.BEGIN in text and gen.END in text
    block = text.split(gen.BEGIN)[1].split(gen.END)[0]
    listed = set(re.findall(r"^\| `(q_\w+)` \|", block, re.M))
    assert listed == set(order), (
        f"generated inventory out of sync: missing={sorted(set(order) - listed)} "
        f"extra={sorted(listed - set(order))} — run tools/gen_survey_inventory.py"
    )
