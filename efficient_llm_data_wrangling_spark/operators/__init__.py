"""Relational + scale operators (SURVEY.md §2.2–2.6 and §7 Phase 4)."""
