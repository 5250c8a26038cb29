/* HS071 through the C API — parity with the reference's examples/hs071_c.
 * Exits 0 and prints "EXIT: Optimal Solution Found." on success (the same
 * gate test/run_unitTests.in:33-41 applies to the reference). */
#include <math.h>
#include <stdio.h>

#include "ipopt_tpu_c.h"

static int eval_f(ipindex n, const ipnumber* x, ipnumber* obj, void* ud) {
    (void)n; (void)ud;
    *obj = x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2];
    return 1;
}

static int eval_grad_f(ipindex n, const ipnumber* x, ipnumber* grad, void* ud) {
    (void)n; (void)ud;
    grad[0] = x[3] * (2.0 * x[0] + x[1] + x[2]);
    grad[1] = x[0] * x[3];
    grad[2] = x[0] * x[3] + 1.0;
    grad[3] = x[0] * (x[0] + x[1] + x[2]);
    return 1;
}

static int eval_g(ipindex n, const ipnumber* x, ipindex m, ipnumber* g,
                  void* ud) {
    (void)n; (void)m; (void)ud;
    g[0] = x[0] * x[1] * x[2] * x[3];
    g[1] = x[0] * x[0] + x[1] * x[1] + x[2] * x[2] + x[3] * x[3];
    return 1;
}

static int eval_jac_g(ipindex n, const ipnumber* x, ipindex m, ipnumber* jac,
                      void* ud) {
    (void)n; (void)m; (void)ud;
    jac[0] = x[1] * x[2] * x[3];
    jac[1] = x[0] * x[2] * x[3];
    jac[2] = x[0] * x[1] * x[3];
    jac[3] = x[0] * x[1] * x[2];
    jac[4] = 2.0 * x[0];
    jac[5] = 2.0 * x[1];
    jac[6] = 2.0 * x[2];
    jac[7] = 2.0 * x[3];
    return 1;
}

int main(void) {
    ipnumber x_L[4] = {1, 1, 1, 1};
    ipnumber x_U[4] = {5, 5, 5, 5};
    ipnumber g_L[2] = {25, 40};
    ipnumber g_U[2] = {2e19, 40};
    ipnumber x[4] = {1, 5, 5, 1};
    ipnumber obj = 0, g[2], mult_g[2], zL[4], zU[4];

    IpoptTpuProblem p = CreateIpoptTpuProblem(
        4, x_L, x_U, 2, g_L, g_U, eval_f, eval_g, eval_grad_f, eval_jac_g);
    if (!p) return 2;
    AddIpoptTpuNumOption(p, "tol", 1e-7);
    AddIpoptTpuIntOption(p, "print_level", 0);
    AddIpoptTpuStrOption(p, "nlp_scaling_method", "gradient-based");

    int status = IpoptTpuSolve(p, x, &obj, g, mult_g, zL, zU, NULL);
    FreeIpoptTpuProblem(p);

    printf("status=%d obj=%.10f x=(%.6f, %.6f, %.6f, %.6f)\n", status, obj,
           x[0], x[1], x[2], x[3]);
    if ((status == IPOPTTPU_SOLVE_SUCCEEDED ||
         status == IPOPTTPU_SOLVED_TO_ACCEPTABLE_LEVEL) &&
        fabs(obj - 17.0140171451792) < 1e-4) {
        printf("EXIT: Optimal Solution Found.\n");
        return 0;
    }
    return 1;
}
