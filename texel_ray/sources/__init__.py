"""Sources: synthetic image+caption table and reader helpers."""
