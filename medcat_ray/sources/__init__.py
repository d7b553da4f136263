"""Ontology / annotation sources (SURVEY.md §2.1 S2-S6)."""
