"""Host-side I/O: message types, point-cloud loading, scan sources, snapshots."""
