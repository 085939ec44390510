"""Host-side data pipeline: feature loaders, datasets, device prefetch."""
