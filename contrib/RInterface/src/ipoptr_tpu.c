/*
 * .Call shim between R and the ipopt_tpu C API — capability parity with the
 * reference's contrib/RInterface/src/ipoptr.cpp + IpoptRNLP.cpp (which bridge
 * R closures into a TNLP). Here R closures are evaluated from the C-API
 * callbacks; solver options arrive stringified and are validated by the
 * Python-side registry (same path as the C/Fortran/JNI shims).
 *
 * Build (gated — needs R headers): R CMD SHLIB with
 *   PKG_CPPFLAGS=-I../../../native  PKG_LIBS=-lipopt_tpu_c
 */
#include <R.h>
#include <Rinternals.h>
#include <string.h>

#include "ipopt_tpu_c.h"

typedef struct {
    SEXP eval_f, eval_g, eval_grad_f, eval_jac_g;
    SEXP env;
} RCtx;

static SEXP call1(SEXP fn, SEXP env, ipindex n, const ipnumber* x)
{
    SEXP rx = PROTECT(allocVector(REALSXP, n));
    memcpy(REAL(rx), x, sizeof(double) * (size_t) n);
    SEXP call = PROTECT(lang2(fn, rx));
    int err = 0;
    SEXP out = R_tryEval(call, env, &err);
    UNPROTECT(2);
    return err ? R_NilValue : out;
}

static int r_eval_f(ipindex n, const ipnumber* x, ipnumber* obj, void* ud)
{
    RCtx* c = (RCtx*) ud;
    SEXP out = call1(c->eval_f, c->env, n, x);
    if (out == R_NilValue || !isReal(coerceVector(out, REALSXP))) return 0;
    *obj = asReal(out);
    return R_FINITE(*obj) || ISNAN(*obj); /* NaN is a signal, not a failure */
}

static int r_eval_g(ipindex n, const ipnumber* x, ipindex m, ipnumber* g,
                    void* ud)
{
    RCtx* c = (RCtx*) ud;
    SEXP out = call1(c->eval_g, c->env, n, x);
    if (out == R_NilValue) return 0;
    SEXP rv = PROTECT(coerceVector(out, REALSXP));
    if (length(rv) != m) { UNPROTECT(1); return 0; }
    memcpy(g, REAL(rv), sizeof(double) * (size_t) m);
    UNPROTECT(1);
    return 1;
}

static int r_eval_grad_f(ipindex n, const ipnumber* x, ipnumber* grad,
                         void* ud)
{
    RCtx* c = (RCtx*) ud;
    SEXP out = call1(c->eval_grad_f, c->env, n, x);
    if (out == R_NilValue) return 0;
    SEXP rv = PROTECT(coerceVector(out, REALSXP));
    if (length(rv) != n) { UNPROTECT(1); return 0; }
    memcpy(grad, REAL(rv), sizeof(double) * (size_t) n);
    UNPROTECT(1);
    return 1;
}

static int r_eval_jac_g(ipindex n, const ipnumber* x, ipindex m,
                        ipnumber* jac, void* ud)
{
    /* Dense row-major m x n; the R side may return a matrix (column-major)
     * or a flat vector in row-major order. */
    RCtx* c = (RCtx*) ud;
    SEXP out = call1(c->eval_jac_g, c->env, n, x);
    if (out == R_NilValue) return 0;
    SEXP rv = PROTECT(coerceVector(out, REALSXP));
    if (length(rv) != m * n) { UNPROTECT(1); return 0; }
    if (isMatrix(out)) {
        const double* v = REAL(rv);
        for (ipindex i = 0; i < m; i++)
            for (ipindex j = 0; j < n; j++)
                jac[i * n + j] = v[j * m + i];
    } else {
        memcpy(jac, REAL(rv), sizeof(double) * (size_t) (m * n));
    }
    UNPROTECT(1);
    return 1;
}

SEXP ipoptr_tpu_solve(SEXP rx0, SEXP rlb, SEXP rub, SEXP rglb, SEXP rgub,
                      SEXP f, SEXP g, SEXP gradf, SEXP jacg,
                      SEXP keys, SEXP vals, SEXP env)
{
    ipindex n = (ipindex) length(rx0);
    ipindex m = (ipindex) length(rglb);
    RCtx ctx = { f, g, gradf, jacg, env };
    int has_grad = isFunction(gradf);
    int has_jac = isFunction(jacg);

    IpoptTpuProblem p = CreateIpoptTpuProblem(
        n, REAL(rlb), REAL(rub), m, m ? REAL(rglb) : NULL,
        m ? REAL(rgub) : NULL, r_eval_f, r_eval_g,
        has_grad ? r_eval_grad_f : NULL, has_jac ? r_eval_jac_g : NULL);
    if (!p) error("ipopt_tpu: problem creation failed");

    for (int i = 0; i < length(keys); i++)
        AddIpoptTpuStrOption(p, CHAR(STRING_ELT(keys, i)),
                             CHAR(STRING_ELT(vals, i)));

    SEXP sol = PROTECT(allocVector(REALSXP, n));
    memcpy(REAL(sol), REAL(rx0), sizeof(double) * (size_t) n);
    SEXP gout = PROTECT(allocVector(REALSXP, m > 0 ? m : 0));
    double obj = 0.0;
    int status = IpoptTpuSolve(p, REAL(sol), &obj, m ? REAL(gout) : NULL,
                               NULL, NULL, NULL, &ctx);
    int iters = (int) IpoptTpuIterCount(p);
    FreeIpoptTpuProblem(p);

    const char* nm[] = {"status", "message", "iterations", "objective",
                        "solution", "constraints", ""};
    SEXP res = PROTECT(mkNamed(VECSXP, nm));
    SET_VECTOR_ELT(res, 0, ScalarInteger(status));
    SET_VECTOR_ELT(res, 1, mkString(IpoptTpuStatusMessage(status)));
    SET_VECTOR_ELT(res, 2, ScalarInteger(iters));
    SET_VECTOR_ELT(res, 3, ScalarReal(obj));
    SET_VECTOR_ELT(res, 4, sol);
    SET_VECTOR_ELT(res, 5, gout);
    UNPROTECT(3);
    return res;
}
