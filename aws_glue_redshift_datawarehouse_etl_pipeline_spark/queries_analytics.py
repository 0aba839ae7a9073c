"""Placeholder — populated as this operator family lands."""
