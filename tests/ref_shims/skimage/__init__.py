"""Import-only shim for scikit-image (not installed)."""
