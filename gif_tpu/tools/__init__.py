"""Host-side conversion tools: FLAME artifacts, torch checkpoints,
Inception weights."""
