/* Minimal MPI *type* shim so the reference's MPI-free numerics sources
 * (field/boundary/diffusion/advection, which only touch Decomp2D's data
 * members) compile WITHOUT an MPI installation.  Only what decomp.hpp
 * names is provided; no MPI function is declared, so accidentally
 * compiling a source that actually calls MPI fails loudly at compile
 * time rather than linking against a fake.
 *
 * Used by tests/test_cpp_reference_parity.py, which compiles the
 * reference sources IN PLACE from /root/reference (read-only) — no
 * reference code is copied into this repository. */
#pragma once

typedef int MPI_Comm;
#define MPI_COMM_NULL ((MPI_Comm)0)
#define MPI_PROC_NULL (-2)
