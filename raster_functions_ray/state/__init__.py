"""Engine state: checkpoint store, lineage records, resume filters."""
