/*
 * ipopt_tpu Fortran API — capability parity with Ipopt's IpStdFInterface.c
 * (reference src/Interfaces/IpStdFInterface.c:321-430).
 *
 * Pure-C shim exposing Fortran-callable (underscore-suffixed,
 * pass-by-reference) entry points IPCREATE / IPSOLVE / IPADDNUMOPTION /
 * IPADDSTROPTION / IPADDINTOPTION / IPFREE on top of the ipopt_tpu C API.
 * Fortran callbacks receive all arguments by reference and report failure
 * through an IERR out-parameter; the Jacobian callback fills a DENSE
 * column-major JAC(M,N) (the TPU build has no triplets — this shim
 * transposes into the C API's row-major layout).
 */
#include <stdlib.h>
#include <string.h>
#include "ipopt_tpu_c.h"

#ifndef F77_FUNC
#define F77_FUNC(name, NAME) name##_
#endif

typedef void* fptr;

typedef void (*FEval_F_CB)(ipindex* N, ipnumber* X, ipnumber* OBJVAL,
                           ipindex* IDAT, ipnumber* DDAT, ipindex* IERR);
typedef void (*FEval_G_CB)(ipindex* N, ipnumber* X, ipindex* M, ipnumber* G,
                           ipindex* IDAT, ipnumber* DDAT, ipindex* IERR);
typedef void (*FEval_Grad_F_CB)(ipindex* N, ipnumber* X, ipnumber* GRAD,
                                ipindex* IDAT, ipnumber* DDAT, ipindex* IERR);
typedef void (*FEval_Jac_G_CB)(ipindex* N, ipnumber* X, ipindex* M,
                               ipnumber* JAC /* column-major (M,N) */,
                               ipindex* IDAT, ipnumber* DDAT, ipindex* IERR);

typedef struct {
    IpoptTpuProblem problem;
    ipindex n, m;
    FEval_F_CB eval_f;
    FEval_G_CB eval_g;
    FEval_Grad_F_CB eval_grad_f;
    FEval_Jac_G_CB eval_jac_g;
    ipindex* idat;
    ipnumber* ddat;
} FUserData;

/* ---- C-API trampolines bridging to the Fortran calling convention ---- */

static int f_eval_f(ipindex n, const ipnumber* x, ipnumber* obj, void* ud)
{
    FUserData* f = (FUserData*)ud;
    ipindex ierr = 0;
    f->eval_f(&f->n, (ipnumber*)x, obj, f->idat, f->ddat, &ierr);
    return ierr == 0;
}

static int f_eval_g(ipindex n, const ipnumber* x, ipindex m, ipnumber* g,
                    void* ud)
{
    FUserData* f = (FUserData*)ud;
    ipindex ierr = 0;
    f->eval_g(&f->n, (ipnumber*)x, &f->m, g, f->idat, f->ddat, &ierr);
    return ierr == 0;
}

static int f_eval_grad_f(ipindex n, const ipnumber* x, ipnumber* grad,
                         void* ud)
{
    FUserData* f = (FUserData*)ud;
    ipindex ierr = 0;
    f->eval_grad_f(&f->n, (ipnumber*)x, grad, f->idat, f->ddat, &ierr);
    return ierr == 0;
}

static int f_eval_jac_g(ipindex n, const ipnumber* x, ipindex m,
                        ipnumber* jac_rowmajor, void* ud)
{
    FUserData* f = (FUserData*)ud;
    ipindex ierr = 0;
    ipnumber* colmajor;
    ipindex i, j;
    if (m == 0)
        return 1;
    colmajor = (ipnumber*)malloc(sizeof(ipnumber) * (size_t)m * (size_t)n);
    if (colmajor == NULL)
        return 0;
    f->eval_jac_g(&f->n, (ipnumber*)x, &f->m, colmajor, f->idat, f->ddat,
                  &ierr);
    for (i = 0; i < m; ++i)
        for (j = 0; j < n; ++j)
            jac_rowmajor[i * n + j] = colmajor[i + j * m];
    free(colmajor);
    return ierr == 0;
}

/* ---- Fortran entry points (IpStdFInterface.c:321 IPCREATE) ---- */

fptr F77_FUNC(ipcreate, IPCREATE)(
    ipindex* N, ipnumber* X_L, ipnumber* X_U, ipindex* M, ipnumber* G_L,
    ipnumber* G_U, FEval_F_CB EVAL_F, FEval_G_CB EVAL_G,
    FEval_Grad_F_CB EVAL_GRAD_F, FEval_Jac_G_CB EVAL_JAC_G)
{
    FUserData* f = (FUserData*)malloc(sizeof(FUserData));
    if (f == NULL)
        return NULL;
    f->n = *N;
    f->m = *M;
    f->eval_f = EVAL_F;
    f->eval_g = EVAL_G;
    f->eval_grad_f = EVAL_GRAD_F;
    f->eval_jac_g = EVAL_JAC_G;
    f->idat = NULL;
    f->ddat = NULL;
    f->problem = CreateIpoptTpuProblem(
        *N, X_L, X_U, *M, G_L, G_U, f_eval_f, f_eval_g,
        EVAL_GRAD_F != NULL ? f_eval_grad_f : NULL,
        EVAL_JAC_G != NULL ? f_eval_jac_g : NULL);
    if (f->problem == NULL) {
        free(f);
        return NULL;
    }
    return (fptr)f;
}

void F77_FUNC(ipfree, IPFREE)(fptr* FProblem)
{
    FUserData* f = (FUserData*)*FProblem;
    if (f != NULL) {
        FreeIpoptTpuProblem(f->problem);
        free(f);
    }
    *FProblem = NULL;
}

ipindex F77_FUNC(ipsolve, IPSOLVE)(
    fptr* FProblem, ipnumber* X, ipnumber* G, ipnumber* OBJ_VAL,
    ipnumber* MULT_G, ipnumber* MULT_X_L, ipnumber* MULT_X_U, ipindex* IDAT,
    ipnumber* DDAT)
{
    FUserData* f = (FUserData*)*FProblem;
    f->idat = IDAT;
    f->ddat = DDAT;
    return IpoptTpuSolve(f->problem, X, OBJ_VAL, G, MULT_G, MULT_X_L,
                         MULT_X_U, (void*)f);
}

/* Fortran strings arrive as (char*, hidden length); trailing blanks
 * stripped (f2cstr, IpStdFInterface.c:404). */
static char* f2cstr(const char* fstr, int slen)
{
    int len;
    char* cstr;
    for (len = slen; len > 0; --len)
        if (fstr[len - 1] != ' ')
            break;
    cstr = (char*)malloc((size_t)len + 1);
    if (cstr != NULL) {
        memcpy(cstr, fstr, (size_t)len);
        cstr[len] = '\0';
    }
    return cstr;
}

ipindex F77_FUNC(ipaddstroption, IPADDSTROPTION)(
    fptr* FProblem, char* KEYWORD, char* VALUE, int klen, int vlen)
{
    FUserData* f = (FUserData*)*FProblem;
    char* k = f2cstr(KEYWORD, klen);
    char* v = f2cstr(VALUE, vlen);
    ipindex ret = (k && v && AddIpoptTpuStrOption(f->problem, k, v)) ? 0 : 1;
    free(k);
    free(v);
    return ret;
}

ipindex F77_FUNC(ipaddnumoption, IPADDNUMOPTION)(
    fptr* FProblem, char* KEYWORD, ipnumber* VALUE, int klen)
{
    FUserData* f = (FUserData*)*FProblem;
    char* k = f2cstr(KEYWORD, klen);
    ipindex ret = (k && AddIpoptTpuNumOption(f->problem, k, *VALUE)) ? 0 : 1;
    free(k);
    return ret;
}

ipindex F77_FUNC(ipaddintoption, IPADDINTOPTION)(
    fptr* FProblem, char* KEYWORD, ipindex* VALUE, int klen)
{
    FUserData* f = (FUserData*)*FProblem;
    char* k = f2cstr(KEYWORD, klen);
    ipindex ret = (k && AddIpoptTpuIntOption(f->problem, k, *VALUE)) ? 0 : 1;
    free(k);
    return ret;
}
