// Exact dense-statevector kicked-Ising evolution (validation oracle).
//
// Native C++ companion to the TPU framework: applies the reference's exact
// Floquet unitary (field double-counting, -i sigma_x-style kicks with
// arbitrary theta) directly on a 2^L statevector in O(L 2^L) per period --
// orders of magnitude faster than building dense 4^L matrices the way the
// NumPy oracle does, extending cheap exact cross-checks to L ~ 24.
//
// Reference semantics mirrored: src/models/kicked_ising.py:73-148
// (SURVEY.md quirks 2-4).  Built as a shared library; called via ctypes
// (timecrystal_tpu/native/__init__.py).

#include <cmath>
#include <complex>
#include <cstdint>
#include <vector>

using cplx = std::complex<double>;

extern "C" {

// Evolve `state` (interleaved re/im, 2^L complex doubles) in place by
// n_periods of U_F = D(tau/2) K(theta) D(tau/2), where D is the diagonal
// Ising half-step (bond-summed fields, double counting interior sites) and
// K is the uniform X rotation exp(-i theta/2 sigma_x) on every site.
void ki_evolve(double* state, int L, double J, const double* h,
               double tau, double theta, int n_periods) {
    const std::int64_t dim = std::int64_t(1) << L;
    cplx* psi = reinterpret_cast<cplx*>(state);

    // precompute the diagonal half-step phases e^{-i tau/2 E(s)} per basis
    // state: E(s) = sum_b J s_b s_{b+1} + h_b s_b + h_{b+1} s_{b+1}
    std::vector<cplx> diag(dim);
    for (std::int64_t idx = 0; idx < dim; ++idx) {
        double E = 0.0;
        // bit 0 = site 0 = MOST significant in the framework's kron order:
        // use site i <-> bit (L-1-i) to match |i_0 i_1 ...> indexing
        for (int b = 0; b < L - 1; ++b) {
            const double s1 = ((idx >> (L - 1 - b)) & 1) ? -1.0 : 1.0;
            const double s2 = ((idx >> (L - 2 - b)) & 1) ? -1.0 : 1.0;
            E += J * s1 * s2 + h[b] * s1 + h[b + 1] * s2;
        }
        const double ang = -0.5 * tau * E;
        diag[idx] = cplx(std::cos(ang), std::sin(ang));
    }

    const double c = std::cos(0.5 * theta);
    const double s = std::sin(0.5 * theta);
    const cplx mis(0.0, -s);  // -i sin(theta/2)

    for (int p = 0; p < n_periods; ++p) {
        for (std::int64_t i = 0; i < dim; ++i) psi[i] *= diag[i];
        // kick on every site: rotate amplitude pairs differing in one bit
        for (int site = 0; site < L; ++site) {
            const std::int64_t bit = std::int64_t(1) << (L - 1 - site);
            for (std::int64_t i = 0; i < dim; ++i) {
                if (i & bit) continue;
                const cplx u = psi[i];
                const cplx v = psi[i | bit];
                psi[i] = c * u + mis * v;
                psi[i | bit] = mis * u + c * v;
            }
        }
        for (std::int64_t i = 0; i < dim; ++i) psi[i] *= diag[i];
    }
}

// Per-site <sigma_z_i> of a statevector: out must hold L doubles.
void ki_sz_sites(const double* state, int L, double* out) {
    const std::int64_t dim = std::int64_t(1) << L;
    const cplx* psi = reinterpret_cast<const cplx*>(state);
    for (int site = 0; site < L; ++site) out[site] = 0.0;
    for (std::int64_t i = 0; i < dim; ++i) {
        const double p = std::norm(psi[i]);
        if (p == 0.0) continue;
        for (int site = 0; site < L; ++site) {
            out[site] += ((i >> (L - 1 - site)) & 1) ? -p : p;
        }
    }
}

}  // extern "C"
