"""Runnable demos — parity with the reference's ``demo <suite> <name>``
CLI (``src/demos/demos.cpp``):  suites ``client``, ``server``,
``client_server_rookie``, ``fft``, ``math_operations``,
``matrix_operations``.

Run:  python -m hetpu.demos <suite> <name> [--small]
"""
