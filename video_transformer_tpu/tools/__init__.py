"""Offline QA tools."""
