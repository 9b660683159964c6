"""Shared state: checkpoint manifests, lineage records, broadcast helpers."""
