# ipoptr.tpu — R interface to ipopt_tpu, capability parity with the
# reference's R package (contrib/RInterface/R/ipoptr.R: same call signature,
# same result-list shape). Instead of a C++ TNLP bridge (IpoptRNLP.cpp), R
# closures are marshalled through the ipopt_tpu C API (native/ipopt_tpu_c.h)
# by the .Call shim in src/ipoptr_tpu.c; derivatives the user does not supply
# come from the backend (autodiff of the rebuilt model / finite differences
# on the callbacks), so eval_grad_f / eval_jac_g are optional here.
#
# Sparsity-structure arguments (eval_jac_g_structure, eval_h,
# eval_h_structure) are accepted for drop-in compatibility but ignored: the
# TPU backend is dense/structured, not triplet-sparse (SURVEY.md §7).

ipoptr.tpu <- function(x0,
                       eval_f,
                       eval_grad_f = NULL,
                       lb = NULL,
                       ub = NULL,
                       eval_g = function(x) numeric(0),
                       eval_jac_g = NULL,
                       eval_jac_g_structure = list(),
                       constraint_lb = numeric(0),
                       constraint_ub = numeric(0),
                       eval_h = NULL,
                       eval_h_structure = NULL,
                       opts = list(),
                       ...) {
    n <- length(x0)
    if (is.null(lb)) lb <- rep(-Inf, n)
    if (is.null(ub)) ub <- rep(Inf, n)
    if (!is.function(eval_f)) stop("eval_f must be a function")
    if (!is.function(eval_g)) stop("eval_g must be a function")
    m <- length(constraint_lb)
    if (length(constraint_ub) != m)
        stop("constraint_lb and constraint_ub must have equal length")
    # Replace R Inf by the solver's 2e19 convention (nlp_upper_bound_inf).
    big <- 2e19
    lb <- pmax(lb, -big); ub <- pmin(ub, big)
    constraint_lb <- pmax(constraint_lb, -big)
    constraint_ub <- pmin(constraint_ub, big)
    keys <- names(opts)
    vals <- vapply(opts, function(v) paste(format(v, digits = 17),
                                           collapse = " "), "")
    ret <- .Call("ipoptr_tpu_solve", as.double(x0),
                 as.double(lb), as.double(ub),
                 as.double(constraint_lb), as.double(constraint_ub),
                 eval_f, eval_g, eval_grad_f, eval_jac_g,
                 as.character(keys), as.character(vals),
                 new.env(), PACKAGE = "ipoptr.tpu")
    # Result shape matches the reference's (print.ipoptr.R fields).
    structure(list(x0 = x0,
                   options = opts,
                   status = ret$status,
                   message = ret$message,
                   iterations = ret$iterations,
                   objective = ret$objective,
                   solution = ret$solution,
                   constraints = ret$constraints),
              class = "ipoptr")
}

print.ipoptr <- function(x, show.controls = TRUE, ...) {
    cat("\nCall:\nipoptr.tpu(...)\n\n")
    cat(paste("ipopt_tpu solver status:", x$status,
              "(", x$message, ")\n\n"))
    cat(paste("Number of iterations....:", x$iterations, "\n"))
    cat(paste("Optimal value of objective function: ", x$objective, "\n"))
    if (show.controls)
        cat("Optimal value of controls:", x$solution, "\n")
    invisible(x)
}
