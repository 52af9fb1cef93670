// Single-rank differential-parity driver around the C++ reference's
// numerics, replicating the reference main loop's observable step order
// exactly (reference: src/main.cpp:93-118): halo exchange (a no-op at
// one rank — every neighbor is MPI_PROC_NULL), apply_boundary, copy
// u -> tmp, diffusion_step (writes tmp from u), advection_step
// (accumulates into tmp from u), swap.  The reference sources are
// compiled unmodified from /root/reference via -I; this file and the
// mpi.h type shim are the only code that lives in this repository.
//
// Usage:
//   ref_harness step nx ny dx dy D vx vy dt steps bcL bcR bcB bcT in.bin out.bin
//   ref_harness safe_dt dx dy vx vy D
//
// bc letters: d=dirichlet n=neumann p=periodic (the reference's periodic
// is a silent no-op — ghosts keep their initial fill(0.0) forever).
// in/out.bin: float64 native-endian interior, C-order (ny, nx).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

#include "advection.hpp"
#include "boundary.hpp"
#include "diffusion.hpp"
#include "field.hpp"
#include "stability.hpp"

static BCType bc_of(const char* s) {
    switch (s[0]) {
        case 'd': return BCType::Dirichlet;
        case 'n': return BCType::Neumann;
        case 'p': return BCType::Periodic;
    }
    std::fprintf(stderr, "bad bc letter: %s\n", s);
    std::exit(2);
}

int main(int argc, char** argv) {
    if (argc >= 2 && std::strcmp(argv[1], "safe_dt") == 0) {
        if (argc != 7) { std::fprintf(stderr, "safe_dt needs 5 args\n"); return 2; }
        const double dx = std::atof(argv[2]), dy = std::atof(argv[3]);
        const double vx = std::atof(argv[4]), vy = std::atof(argv[5]);
        const double D = std::atof(argv[6]);
        std::printf("%.17g\n", safe_dt(dx, dy, vx, vy, D));
        return 0;
    }
    if (argc != 17 || std::strcmp(argv[1], "step") != 0) {
        std::fprintf(stderr,
            "usage: %s step nx ny dx dy D vx vy dt steps bcL bcR bcB bcT in out\n",
            argv[0]);
        return 2;
    }
    const int nx = std::atoi(argv[2]), ny = std::atoi(argv[3]);
    const double dx = std::atof(argv[4]), dy = std::atof(argv[5]);
    const double D = std::atof(argv[6]);
    const double vx = std::atof(argv[7]), vy = std::atof(argv[8]);
    const double dt = std::atof(argv[9]);
    const int steps = std::atoi(argv[10]);
    BCConfig bc;
    bc.left = bc_of(argv[11]);
    bc.right = bc_of(argv[12]);
    bc.bottom = bc_of(argv[13]);
    bc.top = bc_of(argv[14]);

    const int h = 1;
    Field u(nx, ny, h, dx, dy), tmp(nx, ny, h, dx, dy);
    u.fill(0.0);
    tmp.fill(0.0);

    // Fake single-rank decomposition: all neighbors MPI_PROC_NULL (the
    // default member initializers), so every side is a physical edge —
    // the reference's own unit tests use the same pattern
    // (reference: tests/simulation/unit/test_init.cpp:35-45).
    Decomp2D dec;
    dec.dims[0] = dec.dims[1] = 1;
    dec.nx_global = dec.nx_local = nx;
    dec.ny_global = dec.ny_local = ny;

    {
        std::vector<double> buf(static_cast<size_t>(nx) * ny);
        FILE* f = std::fopen(argv[15], "rb");
        if (!f || std::fread(buf.data(), sizeof(double), buf.size(), f) != buf.size()) {
            std::fprintf(stderr, "failed to read %s\n", argv[15]);
            return 2;
        }
        std::fclose(f);
        for (int j = 0; j < ny; ++j)
            for (int i = 0; i < nx; ++i)
                u.at(h + i, h + j) = buf[static_cast<size_t>(j) * nx + i];
    }

    for (int n = 0; n < steps; ++n) {
        // exchange_halos(u): no-op — single rank, all MPI_PROC_NULL.
        apply_boundary(u, dec, bc, 0.0);
        tmp.data = u.data;  // main.cpp:104 — rings carry over
        diffusion_step(u, tmp, D, dt);
        advection_step(u, tmp, vx, vy, dt);
        std::swap(u.data, tmp.data);
    }

    {
        std::vector<double> buf(static_cast<size_t>(nx) * ny);
        for (int j = 0; j < ny; ++j)
            for (int i = 0; i < nx; ++i)
                buf[static_cast<size_t>(j) * nx + i] = u.at(h + i, h + j);
        FILE* f = std::fopen(argv[16], "wb");
        if (!f || std::fwrite(buf.data(), sizeof(double), buf.size(), f) != buf.size()) {
            std::fprintf(stderr, "failed to write %s\n", argv[16]);
            return 2;
        }
        std::fclose(f);
    }
    return 0;
}
