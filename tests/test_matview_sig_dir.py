"""Pins for minhash_lsh_matview's signature-table location (r10
verdict #5 / ADVICE r9): the dir must be user-keyed (not world-
predictable — another account could squat or poison a fixed /tmp
path) and fixed per (user, fixture) so repeated runs overwrite
instead of leaking one tree per run. Same-user concurrent writers
remain out of contract: single-writer is the pinned assumption."""

from __future__ import annotations

import getpass

from automatic_etl_spark.plans.dedup_plans import _matview_sig_dir


def test_sig_dir_is_user_keyed():
    d = _matview_sig_dir("/root/testdata/sf0.01")
    assert getpass.getuser() in d


def test_sig_dir_fixed_per_fixture_distinct_across_fixtures():
    a1 = _matview_sig_dir("/root/testdata/sf0.01")
    a2 = _matview_sig_dir("/root/testdata/sf0.01/")
    b = _matview_sig_dir("/root/testdata/sf0.1")
    assert a1 == a2, "trailing slash must not change the location"
    assert a1 != b, "different fixtures must not share a signature dir"
