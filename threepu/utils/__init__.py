"""Host-side utilities (maps reference layer L1)."""
