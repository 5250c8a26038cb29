/*
 * ipopt_tpu Java/JNI bridge — capability parity with Ipopt's Java interface
 * (reference src/Interfaces/IpStdJInterface.cpp:1-1146 and
 * src/Interfaces/Ipopt.java:1-854, class org.coinor.Ipopt).
 *
 * Users subclass java/org/ipopttpu/IpoptTpu.java and override eval_f /
 * eval_g (and optionally eval_grad_f / eval_jac_g for analytic derivatives;
 * the default is finite differences, mirroring the C API contract).  This
 * shim marshals between the JVM and the ipopt_tpu C API
 * (native/ipopt_tpu_c.h), exactly as the reference's JNI layer marshals to
 * IpoptApplication.
 *
 * Build (gated — requires a JDK):
 *   cmake -DIPOPT_TPU_BUILD_JNI=ON ...   (see native/CMakeLists.txt)
 */
#include <jni.h>
#include <stdlib.h>
#include <string.h>

#include "ipopt_tpu_c.h"

/* Per-solve context carrying the JNI env and the user's Java object. */
typedef struct {
    JNIEnv* env;
    jobject obj;           /* the IpoptTpu instance */
    jmethodID m_eval_f;
    jmethodID m_eval_g;
    jmethodID m_eval_grad_f;
    jmethodID m_eval_jac_g;
    int has_grad_f;
    int has_jac_g;
} JniCtx;

static int jni_eval_f(ipindex n, const ipnumber* x, ipnumber* obj_out,
                      void* ud)
{
    JniCtx* c = (JniCtx*) ud;
    JNIEnv* env = c->env;
    jdoubleArray jx = (*env)->NewDoubleArray(env, n);
    jdoubleArray jf = (*env)->NewDoubleArray(env, 1);
    if (!jx || !jf) return 0;
    (*env)->SetDoubleArrayRegion(env, jx, 0, n, (const jdouble*) x);
    jboolean ok = (*env)->CallBooleanMethod(env, c->obj, c->m_eval_f, (jint) n,
                                            jx, jf);
    if ((*env)->ExceptionCheck(env)) { (*env)->ExceptionClear(env); ok = 0; }
    if (ok)
        (*env)->GetDoubleArrayRegion(env, jf, 0, 1, (jdouble*) obj_out);
    (*env)->DeleteLocalRef(env, jx);
    (*env)->DeleteLocalRef(env, jf);
    return ok ? 1 : 0;
}

static int jni_eval_g(ipindex n, const ipnumber* x, ipindex m, ipnumber* g,
                      void* ud)
{
    JniCtx* c = (JniCtx*) ud;
    JNIEnv* env = c->env;
    jdoubleArray jx = (*env)->NewDoubleArray(env, n);
    jdoubleArray jg = (*env)->NewDoubleArray(env, m);
    if (!jx || !jg) return 0;
    (*env)->SetDoubleArrayRegion(env, jx, 0, n, (const jdouble*) x);
    jboolean ok = (*env)->CallBooleanMethod(env, c->obj, c->m_eval_g, (jint) n,
                                            jx, (jint) m, jg);
    if ((*env)->ExceptionCheck(env)) { (*env)->ExceptionClear(env); ok = 0; }
    if (ok)
        (*env)->GetDoubleArrayRegion(env, jg, 0, m, (jdouble*) g);
    (*env)->DeleteLocalRef(env, jx);
    (*env)->DeleteLocalRef(env, jg);
    return ok ? 1 : 0;
}

static int jni_eval_grad_f(ipindex n, const ipnumber* x, ipnumber* grad,
                           void* ud)
{
    JniCtx* c = (JniCtx*) ud;
    JNIEnv* env = c->env;
    jdoubleArray jx = (*env)->NewDoubleArray(env, n);
    jdoubleArray jgr = (*env)->NewDoubleArray(env, n);
    if (!jx || !jgr) return 0;
    (*env)->SetDoubleArrayRegion(env, jx, 0, n, (const jdouble*) x);
    jboolean ok = (*env)->CallBooleanMethod(env, c->obj, c->m_eval_grad_f,
                                            (jint) n, jx, jgr);
    if ((*env)->ExceptionCheck(env)) { (*env)->ExceptionClear(env); ok = 0; }
    if (ok)
        (*env)->GetDoubleArrayRegion(env, jgr, 0, n, (jdouble*) grad);
    (*env)->DeleteLocalRef(env, jx);
    (*env)->DeleteLocalRef(env, jgr);
    return ok ? 1 : 0;
}

static int jni_eval_jac_g(ipindex n, const ipnumber* x, ipindex m,
                          ipnumber* jac, void* ud)
{
    JniCtx* c = (JniCtx*) ud;
    JNIEnv* env = c->env;
    jdoubleArray jx = (*env)->NewDoubleArray(env, n);
    jdoubleArray jj = (*env)->NewDoubleArray(env, (jsize) (m * n));
    if (!jx || !jj) return 0;
    (*env)->SetDoubleArrayRegion(env, jx, 0, n, (const jdouble*) x);
    jboolean ok = (*env)->CallBooleanMethod(env, c->obj, c->m_eval_jac_g,
                                            (jint) n, jx, (jint) m, jj);
    if ((*env)->ExceptionCheck(env)) { (*env)->ExceptionClear(env); ok = 0; }
    if (ok)
        (*env)->GetDoubleArrayRegion(env, jj, 0, (jsize) (m * n),
                                     (jdouble*) jac);
    (*env)->DeleteLocalRef(env, jx);
    (*env)->DeleteLocalRef(env, jj);
    return ok ? 1 : 0;
}

/* org.ipopttpu.IpoptTpu native: int solveNative(
 *     int n, double[] xL, double[] xU, int m, double[] gL, double[] gU,
 *     boolean hasGradF, boolean hasJacG,
 *     String[] optKeys, String[] optVals,   // stringified options
 *     double[] x,                            // in: start, out: solution
 *     double[] obj, double[] g, double[] multG,
 *     double[] multXL, double[] multXU) */
JNIEXPORT jint JNICALL Java_org_ipopttpu_IpoptTpu_solveNative(
    JNIEnv* env, jobject self, jint n, jdoubleArray jxL, jdoubleArray jxU,
    jint m, jdoubleArray jgL, jdoubleArray jgU, jboolean hasGradF,
    jboolean hasJacG, jobjectArray optKeys, jobjectArray optVals,
    jdoubleArray jx, jdoubleArray jobjv, jdoubleArray jg,
    jdoubleArray jmultG, jdoubleArray jmultXL, jdoubleArray jmultXU)
{
    jclass cls = (*env)->GetObjectClass(env, self);
    JniCtx ctx;
    memset(&ctx, 0, sizeof(ctx));
    ctx.env = env;
    ctx.obj = self;
    ctx.m_eval_f = (*env)->GetMethodID(env, cls, "eval_f", "(I[D[D)Z");
    ctx.m_eval_g = (*env)->GetMethodID(env, cls, "eval_g", "(I[DI[D)Z");
    ctx.m_eval_grad_f = (*env)->GetMethodID(env, cls, "eval_grad_f",
                                            "(I[D[D)Z");
    ctx.m_eval_jac_g = (*env)->GetMethodID(env, cls, "eval_jac_g",
                                           "(I[DI[D)Z");
    if (!ctx.m_eval_f || !ctx.m_eval_g) return IPOPTTPU_INTERNAL_ERROR;
    ctx.has_grad_f = hasGradF;
    ctx.has_jac_g = hasJacG;

    double* xL = (*env)->GetDoubleArrayElements(env, jxL, NULL);
    double* xU = (*env)->GetDoubleArrayElements(env, jxU, NULL);
    double* gL = m ? (*env)->GetDoubleArrayElements(env, jgL, NULL) : NULL;
    double* gU = m ? (*env)->GetDoubleArrayElements(env, jgU, NULL) : NULL;

    IpoptTpuProblem p = CreateIpoptTpuProblem(
        n, xL, xU, m, gL, gU, jni_eval_f, jni_eval_g,
        hasGradF ? jni_eval_grad_f : NULL, hasJacG ? jni_eval_jac_g : NULL);

    (*env)->ReleaseDoubleArrayElements(env, jxL, xL, JNI_ABORT);
    (*env)->ReleaseDoubleArrayElements(env, jxU, xU, JNI_ABORT);
    if (m) {
        (*env)->ReleaseDoubleArrayElements(env, jgL, gL, JNI_ABORT);
        (*env)->ReleaseDoubleArrayElements(env, jgU, gU, JNI_ABORT);
    }
    if (!p) return IPOPTTPU_INTERNAL_ERROR;

    /* Options arrive stringified; AddIpoptTpuStrOption routes every type
     * through the Python-side registry which parses/validates (mirrors
     * Ipopt.java's addNumOption/addStrOption/addIntOption trio). */
    jsize nopt = optKeys ? (*env)->GetArrayLength(env, optKeys) : 0;
    for (jsize i = 0; i < nopt; i++) {
        jstring jk = (jstring) (*env)->GetObjectArrayElement(env, optKeys, i);
        jstring jv = (jstring) (*env)->GetObjectArrayElement(env, optVals, i);
        const char* k = (*env)->GetStringUTFChars(env, jk, NULL);
        const char* v = (*env)->GetStringUTFChars(env, jv, NULL);
        AddIpoptTpuStrOption(p, k, v);
        (*env)->ReleaseStringUTFChars(env, jk, k);
        (*env)->ReleaseStringUTFChars(env, jv, v);
        (*env)->DeleteLocalRef(env, jk);
        (*env)->DeleteLocalRef(env, jv);
    }

    double* x = (*env)->GetDoubleArrayElements(env, jx, NULL);
    double objv = 0.0;
    double* g = (m && jg) ? malloc(sizeof(double) * m) : NULL;
    double* mg = (m && jmultG) ? malloc(sizeof(double) * m) : NULL;
    double* mxl = jmultXL ? malloc(sizeof(double) * n) : NULL;
    double* mxu = jmultXU ? malloc(sizeof(double) * n) : NULL;

    int status = IpoptTpuSolve(p, x, &objv, g, mg, mxl, mxu, &ctx);

    (*env)->ReleaseDoubleArrayElements(env, jx, x, 0);  /* copy back */
    if (jobjv)
        (*env)->SetDoubleArrayRegion(env, jobjv, 0, 1, &objv);
    if (g) {
        (*env)->SetDoubleArrayRegion(env, jg, 0, m, g);
        free(g);
    }
    if (mg) {
        (*env)->SetDoubleArrayRegion(env, jmultG, 0, m, mg);
        free(mg);
    }
    if (mxl) {
        (*env)->SetDoubleArrayRegion(env, jmultXL, 0, n, mxl);
        free(mxl);
    }
    if (mxu) {
        (*env)->SetDoubleArrayRegion(env, jmultXU, 0, n, mxu);
        free(mxu);
    }
    FreeIpoptTpuProblem(p);
    return status;
}
