/*
 * HS071 in Java against the ipopt_tpu JNI bridge — parity with the
 * reference's Java example (examples/hs071_java/HS071.java) and its test
 * gate: solve must return SOLVE_SUCCEEDED and reach
 * f* = 17.0140171451792, x* = (1, 4.743, 3.82115, 1.379408).
 *
 * Build/run (requires a JDK; the JNI library is gated in
 * native/CMakeLists.txt behind -DIPOPT_TPU_BUILD_JNI=ON):
 *   javac -d build native/java/org/ipopttpu/IpoptTpu.java native/java/HS071.java
 *   java -cp build -Djava.library.path=native/build HS071
 */
import org.ipopttpu.IpoptTpu;

public class HS071 extends IpoptTpu {
    @Override
    public boolean eval_f(int n, double[] x, double[] obj) {
        obj[0] = x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2];
        return true;
    }

    @Override
    public boolean eval_g(int n, double[] x, int m, double[] g) {
        g[0] = x[0] * x[1] * x[2] * x[3];
        g[1] = x[0] * x[0] + x[1] * x[1] + x[2] * x[2] + x[3] * x[3];
        return true;
    }

    @Override
    public boolean eval_grad_f(int n, double[] x, double[] grad) {
        grad[0] = x[3] * (2 * x[0] + x[1] + x[2]);
        grad[1] = x[0] * x[3];
        grad[2] = x[0] * x[3] + 1.0;
        grad[3] = x[0] * (x[0] + x[1] + x[2]);
        return true;
    }

    @Override
    protected boolean hasGradF() { return true; }

    public static void main(String[] args) {
        HS071 p = new HS071();
        double[] one = {1, 1, 1, 1}, five = {5, 5, 5, 5};
        p.create(4, one, five, 2,
                 new double[]{25.0, 40.0}, new double[]{2e19, 40.0});
        p.addNumOption("tol", 1e-8);
        p.addIntOption("print_level", 3);
        int st = p.optimizeNLP(new double[]{1, 5, 5, 1});
        System.out.printf("status=%d f=%.13f%n", st, p.getObjectiveValue());
        double[] x = p.getVariableValues();
        System.out.printf("x = (%.8f, %.8f, %.8f, %.8f)%n",
                          x[0], x[1], x[2], x[3]);
        if (st != SOLVE_SUCCEEDED
                || Math.abs(p.getObjectiveValue() - 17.0140171451792) > 1e-5) {
            System.out.println("*** HS071 Java test FAILED");
            System.exit(1);
        }
        System.out.println("EXIT: Optimal Solution Found.");
    }
}
