"""Host-side data layer: dataset readers, transforms, fixed-shape collate."""
