/*
 * ipopt_tpu C API — capability parity with Ipopt's IpStdCInterface.h
 * (reference src/Interfaces/IpStdCInterface.h:46-410).
 *
 * C programs describe the NLP with callbacks (objective, constraints, and
 * optionally dense first derivatives, exactly like Ipopt's Eval_F_CB family)
 * and call IpoptTpuSolve.  The implementation embeds CPython and drives the
 * ipopt_tpu JAX solver; user callbacks are bridged through host callbacks
 * with finite-difference or user-supplied derivatives (C callbacks cannot be
 * autodiffed, matching the reference's hand-coded-derivative contract).
 *
 * Build: see native/CMakeLists.txt (produces libipopt_tpu_c.so).
 */
#ifndef IPOPT_TPU_C_H
#define IPOPT_TPU_C_H

#ifdef __cplusplus
extern "C" {
#endif

typedef double ipnumber;
typedef int ipindex;
typedef struct IpoptTpuProblemInfo* IpoptTpuProblem;

/* Callback signatures (dense Jacobian — the TPU build has no triplets). */
typedef int (*IpoptTpu_Eval_F)(ipindex n, const ipnumber* x, ipnumber* obj,
                               void* user_data);
typedef int (*IpoptTpu_Eval_Grad_F)(ipindex n, const ipnumber* x,
                                    ipnumber* grad, void* user_data);
typedef int (*IpoptTpu_Eval_G)(ipindex n, const ipnumber* x, ipindex m,
                               ipnumber* g, void* user_data);
typedef int (*IpoptTpu_Eval_Jac_G)(ipindex n, const ipnumber* x, ipindex m,
                                   ipnumber* jac /* m*n row-major */,
                                   void* user_data);

/* Mirrors ApplicationReturnStatus (IpReturnCodes_inc.h). */
enum IpoptTpuStatus {
    IPOPTTPU_SOLVE_SUCCEEDED = 0,
    IPOPTTPU_SOLVED_TO_ACCEPTABLE_LEVEL = 1,
    IPOPTTPU_INFEASIBLE_PROBLEM_DETECTED = 2,
    IPOPTTPU_SEARCH_DIRECTION_BECOMES_TOO_SMALL = 3,
    IPOPTTPU_DIVERGING_ITERATES = 4,
    IPOPTTPU_USER_REQUESTED_STOP = 5,
    IPOPTTPU_MAXITER_EXCEEDED = -1,
    IPOPTTPU_RESTORATION_FAILED = -2,
    IPOPTTPU_ERROR_IN_STEP_COMPUTATION = -3,
    IPOPTTPU_INVALID_OPTION = -12,
    IPOPTTPU_INTERNAL_ERROR = -199
};

/* CreateIpoptProblem equivalent.  Pass NULL for eval_grad_f / eval_jac_g to
 * use finite differences. */
IpoptTpuProblem CreateIpoptTpuProblem(
    ipindex n, const ipnumber* x_L, const ipnumber* x_U,
    ipindex m, const ipnumber* g_L, const ipnumber* g_U,
    IpoptTpu_Eval_F eval_f, IpoptTpu_Eval_G eval_g,
    IpoptTpu_Eval_Grad_F eval_grad_f, IpoptTpu_Eval_Jac_G eval_jac_g);

void FreeIpoptTpuProblem(IpoptTpuProblem p);

/* AddIpoptNumOption / AddIpoptStrOption / AddIpoptIntOption equivalents. */
int AddIpoptTpuNumOption(IpoptTpuProblem p, const char* keyword, ipnumber val);
int AddIpoptTpuStrOption(IpoptTpuProblem p, const char* keyword, const char* val);
int AddIpoptTpuIntOption(IpoptTpuProblem p, const char* keyword, ipindex val);

/* IpoptSolve equivalent: x is in/out (start point -> solution); obj_val,
 * mult_g (m), mult_x_L (n), mult_x_U (n) are optional outputs. */
int IpoptTpuSolve(IpoptTpuProblem p, ipnumber* x, ipnumber* obj_val,
                  ipnumber* g_out, ipnumber* mult_g, ipnumber* mult_x_L,
                  ipnumber* mult_x_U, void* user_data);

/* SolveStatistics-style accessors (reference IpSolveStatistics.hpp:53-129):
 * human-readable status message (matches the reference's EXIT strings) and
 * the iteration count of the last IpoptTpuSolve on this problem. */
const char* IpoptTpuStatusMessage(int status);
ipindex IpoptTpuIterCount(IpoptTpuProblem p);

#ifdef __cplusplus
}
#endif
#endif /* IPOPT_TPU_C_H */
