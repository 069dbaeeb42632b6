// slepc_tpu native: simplicial sparse LDL^T factorization with inertia.
//
// Role (reference parity): SLEPc's shift-and-invert and spectrum slicing
// rely on PETSc's sparse Cholesky/LDL^T factorizations and read the matrix
// inertia off the factor (MatGetInertia; EPSSliceGetInertia,
// src/eps/impls/krylov/krylovschur/ks-slice.c:227-258).  SciPy offers LU
// (no inertia) only, so this component provides the missing native piece
// for the TPU framework's host tier: factor once per shift, many
// triangular solves (driving the Krylov inner loop), inertia per shift
// (driving slicing bisection).
//
// Algorithm: up-looking simplicial LDL^T on the permuted matrix
//   P A P^T = L D L^T
// with 1x1 pivots (symmetric quasi-definite handling via tiny-pivot
// perturbation, counted as zero-inertia entries).  Column order is taken
// from the caller (reverse Cuthill-McKee computed host-side keeps fill
// modest for the banded/stencil matrices the eigensolvers produce).
//
// Exposed as a flat C API consumed through ctypes (no pybind11 in the
// build image).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

struct LDLFactor {
  int64_t n = 0;
  // CSC of L (unit diagonal implicit)
  std::vector<int64_t> Lp, Li;
  std::vector<double> Lx;
  std::vector<double> D;
  std::vector<int64_t> perm, iperm;  // PAP^T: row/col i of A -> perm[i]
  int64_t n_neg = 0, n_zero = 0, n_pos = 0;
};

// Build elimination tree and column counts, then factor.  A is the UPPER
// triangle (in the permuted ordering) in CSC: for column j, rows i <= j.
static int factor_upper_csc(LDLFactor* F, int64_t n, const int64_t* Ap,
                            const int64_t* Ai, const double* Ax,
                            double pivot_tol) {
  std::vector<int64_t> parent(n, -1), flag(n, -1), Lnz(n, 0), pattern(n);
  // --- symbolic: etree + nonzero counts of each row of L ---
  for (int64_t k = 0; k < n; ++k) {
    flag[k] = k;
    for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
      int64_t i = Ai[p];
      if (i >= k) continue;
      for (; flag[i] != k; i = parent[i]) {
        if (parent[i] == -1) parent[i] = k;
        Lnz[i]++;
        flag[i] = k;
      }
    }
  }
  F->Lp.assign(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) F->Lp[i + 1] = F->Lp[i] + Lnz[i];
  F->Li.assign(F->Lp[n], 0);
  F->Lx.assign(F->Lp[n], 0.0);
  F->D.assign(n, 0.0);

  // --- numeric: up-looking, column k of L computed from sparse solve ---
  std::vector<double> y(n, 0.0);
  std::vector<int64_t> lnz_count(n, 0);
  double dmax = 0.0;
  for (int64_t k = 0; k < n; ++k) {
    // scatter A(:,k) upper into y; build reach pattern via etree
    int64_t top = n;
    flag[k] = k;
    double ykk = 0.0;
    for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
      int64_t i = Ai[p];
      if (i > k) continue;
      if (i == k) {
        ykk = Ax[p];
        continue;
      }
      y[i] = Ax[p];
      int64_t len = 0;
      for (; flag[i] != k; i = parent[i]) {
        pattern[len++] = i;
        flag[i] = k;
      }
      while (len > 0) pattern[--top] = pattern[--len];
    }
    F->D[k] = ykk;
    // solve along the pattern (ascending etree order)
    for (int64_t t = top; t < n; ++t) {
      int64_t i = pattern[t];
      double yi = y[i];
      y[i] = 0.0;
      int64_t p2 = F->Lp[i] + lnz_count[i];
      double l_ki = yi / F->D[i];
      for (int64_t p = F->Lp[i]; p < p2; ++p) y[F->Li[p]] -= F->Lx[p] * yi;
      F->D[k] -= l_ki * yi;
      F->Li[p2] = k;
      F->Lx[p2] = l_ki;
      lnz_count[i]++;
    }
    double ad = std::fabs(F->D[k]);
    if (ad > dmax) dmax = ad;
    if (ad <= pivot_tol * (dmax > 0 ? dmax : 1.0)) {
      F->n_zero++;
      // perturb to continue (the caller may re-shift; reference perturbs
      // the shift when a factorization hits an eigenvalue)
      F->D[k] = (F->D[k] >= 0 ? 1.0 : -1.0) *
                (pivot_tol * (dmax > 0 ? dmax : 1.0) + 1e-300);
    } else if (F->D[k] < 0) {
      F->n_neg++;
    } else {
      F->n_pos++;
    }
  }
  return 0;
}

// Public API -----------------------------------------------------------

// A given as full symmetric CSR (0-based, int64 indices, double values);
// perm = fill-reducing permutation (length n).  Returns opaque handle.
void* ldl_factor(int64_t n, const int64_t* Ap, const int64_t* Ai,
                 const double* Ax, const int64_t* perm, double pivot_tol) {
  auto* F = new LDLFactor();
  F->n = n;
  F->perm.assign(perm, perm + n);
  F->iperm.assign(n, 0);
  for (int64_t i = 0; i < n; ++i) F->iperm[F->perm[i]] = i;

  // build permuted UPPER-triangle CSC: column j' holds entries (i', j')
  // with i' <= j', where i' = iperm[i] etc.  CSC(col j') == CSR(row j')
  // of the lower triangle; assemble by counting.
  std::vector<int64_t> cnt(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t ip = F->iperm[i];
    for (int64_t p = Ap[i]; p < Ap[i + 1]; ++p) {
      int64_t jp = F->iperm[Ai[p]];
      int64_t col = ip > jp ? ip : jp;  // store at column max(i',j')
      if (ip == jp) {
        cnt[col]++;  // diagonal
      } else if (ip < jp) {
        cnt[jp]++;  // entry (ip, jp): upper, column jp
      }
      // ip > jp: lower duplicate of a symmetric entry -> skip
    }
  }
  std::vector<int64_t> Bp(n + 1, 0);
  for (int64_t j = 0; j < n; ++j) Bp[j + 1] = Bp[j] + cnt[j];
  std::vector<int64_t> Bi(Bp[n]);
  std::vector<double> Bx(Bp[n]);
  std::vector<int64_t> fill(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t ip = F->iperm[i];
    for (int64_t p = Ap[i]; p < Ap[i + 1]; ++p) {
      int64_t jp = F->iperm[Ai[p]];
      if (ip > jp) continue;
      int64_t col = jp, row = ip;
      int64_t q = Bp[col] + fill[col]++;
      Bi[q] = row;
      Bx[q] = Ax[p];
    }
  }
  int rc = factor_upper_csc(F, n, Bp.data(), Bi.data(), Bx.data(), pivot_tol);
  if (rc != 0) {
    delete F;
    return nullptr;
  }
  return F;
}

void ldl_inertia(void* handle, int64_t* neg, int64_t* zero, int64_t* pos) {
  auto* F = static_cast<LDLFactor*>(handle);
  *neg = F->n_neg;
  *zero = F->n_zero;
  *pos = F->n_pos;
}

int64_t ldl_nnz(void* handle) {
  auto* F = static_cast<LDLFactor*>(handle);
  return static_cast<int64_t>(F->Lx.size()) + F->n;
}

// Solve A x = b for nrhs right-hand sides (column-major b, n x nrhs).
void ldl_solve(void* handle, double* b, int64_t nrhs) {
  auto* F = static_cast<LDLFactor*>(handle);
  const int64_t n = F->n;
  std::vector<double> y(n);
  for (int64_t r = 0; r < nrhs; ++r) {
    double* col = b + r * n;
    for (int64_t i = 0; i < n; ++i) y[i] = col[F->perm[i]];
    // L z = y (unit lower, CSC columns scatter)
    for (int64_t j = 0; j < n; ++j) {
      double yj = y[j];
      for (int64_t p = F->Lp[j]; p < F->Lp[j + 1]; ++p)
        y[F->Li[p]] -= F->Lx[p] * yj;
    }
    // D w = z
    for (int64_t j = 0; j < n; ++j) y[j] /= F->D[j];
    // L^T x = w (gather)
    for (int64_t j = n - 1; j >= 0; --j) {
      double s = y[j];
      for (int64_t p = F->Lp[j]; p < F->Lp[j + 1]; ++p)
        s -= F->Lx[p] * y[F->Li[p]];
      y[j] = s;
    }
    for (int64_t i = 0; i < n; ++i) col[F->perm[i]] = y[i];
  }
}

void ldl_free(void* handle) { delete static_cast<LDLFactor*>(handle); }

}  // extern "C"
