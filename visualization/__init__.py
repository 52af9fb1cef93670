"""Offline visualization for climate-sim snapshot files.

API-compatible with the reference package (reference: visualization/):
``io.load_global/list_available_steps/load_metadata``,
``plots.imshow_field/compare_fields/animate_from_outputs``, and the
``python -m visualization.cli`` command-line tool (prog ``climate-vis``).

Reads the classic-NetCDF files written by climate_sim_tpu (and by the
reference's climate_sim binary) via netCDF4 when installed, falling back to
the built-in pure-Python reader otherwise.
"""
