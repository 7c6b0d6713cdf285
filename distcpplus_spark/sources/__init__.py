"""Data sources: distributed file listing + regex source selection."""
