/*
 * ipopt_tpu Java interface — capability parity with Ipopt's Java binding
 * (reference src/Interfaces/Ipopt.java:1-854, class org.coinor.Ipopt, and
 * src/Interfaces/IpStdJInterface.cpp).
 *
 * Users subclass IpoptTpu, override {@link #eval_f} and {@link #eval_g}
 * (and optionally {@link #eval_grad_f} / {@link #eval_jac_g} for analytic
 * derivatives — otherwise derivatives come from finite differences on the
 * native side, matching the C API contract), call {@link #create}, set
 * options with the add*Option trio, and call {@link #optimizeNLP}.
 *
 * Differences from org.coinor.Ipopt, by design (TPU-native backend):
 *  - Jacobians are dense row-major double[m*n] rather than triplet
 *    (iRow/jCol/values): the backend is autodiff/structured, not
 *    triplet-sparse (see SURVEY.md §7 design translation).
 *  - eval_h is not part of the FFI surface; the Hessian is always computed
 *    by autodiff of the model the native bridge rebuilds (same as the C and
 *    Fortran shims, native/ipopt_tpu_c.h).
 */
package org.ipopttpu;

import java.util.ArrayList;

public abstract class IpoptTpu {
    /* Return codes — mirror IpReturnCodes_inc.h / ipopt_tpu_c.h. */
    public static final int SOLVE_SUCCEEDED = 0;
    public static final int SOLVED_TO_ACCEPTABLE_LEVEL = 1;
    public static final int INFEASIBLE_PROBLEM_DETECTED = 2;
    public static final int SEARCH_DIRECTION_BECOMES_TOO_SMALL = 3;
    public static final int DIVERGING_ITERATES = 4;
    public static final int USER_REQUESTED_STOP = 5;
    public static final int FEASIBLE_POINT_FOUND = 6;
    public static final int MAXITER_EXCEEDED = -1;
    public static final int RESTORATION_FAILED = -2;
    public static final int ERROR_IN_STEP_COMPUTATION = -3;
    public static final int CPUTIME_EXCEEDED = -4;
    public static final int NOT_ENOUGH_DEGREES_OF_FREEDOM = -10;
    public static final int INVALID_PROBLEM_DEFINITION = -11;
    public static final int INVALID_OPTION = -12;
    public static final int INVALID_NUMBER_DETECTED = -13;
    public static final int UNRECOVERABLE_EXCEPTION = -100;
    public static final int NONIPOPT_EXCEPTION_THROWN = -101;
    public static final int INSUFFICIENT_MEMORY = -102;
    public static final int INTERNAL_ERROR = -199;

    static {
        System.loadLibrary("ipopt_tpu_jni");
    }

    private int n;
    private int m;
    private double[] xL, xU, gL, gU;
    private final ArrayList<String> optKeys = new ArrayList<>();
    private final ArrayList<String> optVals = new ArrayList<>();

    /* Solution snapshot, filled by optimizeNLP (SolveStatistics analog,
     * reference IpSolveStatistics.hpp:53-129 / Ipopt.java getters). */
    private double[] x;
    private final double[] obj = new double[1];
    private double[] g;
    private double[] multG, multXL, multXU;
    private int status = INTERNAL_ERROR;

    /** Define problem dimensions and bounds (get_nlp_info/get_bounds_info
     *  analog, reference IpTNLP.hpp:99-230). Infinite bounds: +/-2e19. */
    public void create(int n, double[] xL, double[] xU,
                       int m, double[] gL, double[] gU) {
        this.n = n;
        this.m = m;
        this.xL = xL.clone();
        this.xU = xU.clone();
        this.gL = m > 0 ? gL.clone() : new double[0];
        this.gU = m > 0 ? gU.clone() : new double[0];
        this.x = new double[n];
        this.g = new double[Math.max(m, 1)];
        this.multG = new double[Math.max(m, 1)];
        this.multXL = new double[n];
        this.multXU = new double[n];
    }

    /* ------------ user callbacks (TNLP evals, IpTNLP.hpp:260-400) ------- */

    /** Objective value: write f(x) into objValue[0]; return true on success. */
    public abstract boolean eval_f(int n, double[] x, double[] objValue);

    /** Constraint values: write g(x) into g[0..m); return true on success. */
    public abstract boolean eval_g(int n, double[] x, int m, double[] g);

    /** Optional analytic gradient of f. Override together with
     *  {@link #hasGradF}. */
    public boolean eval_grad_f(int n, double[] x, double[] gradF) {
        return false;
    }

    /** Optional analytic Jacobian of g, dense row-major double[m*n].
     *  Override together with {@link #hasJacG}. */
    public boolean eval_jac_g(int n, double[] x, int m, double[] jac) {
        return false;
    }

    /** Whether eval_grad_f is implemented (else finite differences). */
    protected boolean hasGradF() { return false; }

    /** Whether eval_jac_g is implemented (else finite differences). */
    protected boolean hasJacG() { return false; }

    /* ------------ options (Ipopt.java addStr/Num/IntOption) ------------- */

    public boolean addStrOption(String keyword, String val) {
        optKeys.add(keyword);
        optVals.add(val);
        return true;
    }

    public boolean addNumOption(String keyword, double val) {
        return addStrOption(keyword, Double.toString(val));
    }

    public boolean addIntOption(String keyword, int val) {
        return addStrOption(keyword, Integer.toString(val));
    }

    /* ------------ solve ------------------------------------------------- */

    /** Run the solver from starting point x0 (length n). Returns the
     *  application return status (Ipopt.java OptimizeNLP analog). */
    public int optimizeNLP(double[] x0) {
        System.arraycopy(x0, 0, x, 0, n);
        status = solveNative(n, xL, xU, m, gL, gU, hasGradF(), hasJacG(),
                             optKeys.toArray(new String[0]),
                             optVals.toArray(new String[0]),
                             x, obj, g, multG, multXL, multXU);
        return status;
    }

    /* ------------ solution getters (Ipopt.java getState etc.) ----------- */

    public int getStatus() { return status; }
    public double[] getVariableValues() { return x; }
    public double getObjectiveValue() { return obj[0]; }
    public double[] getConstraintValues() { return g; }
    public double[] getConstraintMultipliers() { return multG; }
    public double[] getLowerBoundMultipliers() { return multXL; }
    public double[] getUpperBoundMultipliers() { return multXU; }

    private native int solveNative(
        int n, double[] xL, double[] xU, int m, double[] gL, double[] gU,
        boolean hasGradF, boolean hasJacG,
        String[] optKeys, String[] optVals,
        double[] x, double[] obj, double[] g,
        double[] multG, double[] multXL, double[] multXU);
}
