"""Canonical regression settings. Ref: scarlet/testing/settings.py:1-5."""
max_iter = 100
e_rel = 1e-4
filters = "grizy"
