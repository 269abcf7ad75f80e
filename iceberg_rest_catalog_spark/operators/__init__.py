"""Relational operators over cataloged tables (SURVEY.md §2.B).

Each module registers queries into :mod:`..registry`; everything here is a
stock DataFrame/Catalyst plan — no custom execution code.
"""
