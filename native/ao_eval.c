/* Host-side float64 crystalline AO collocation (C, OpenMP).
 *
 * The build-time companion of the device kernels: evaluates
 *     ao[g, mu] = sum_T phi_mu(r_g - A_mu - T)
 * in float64 for the once-per-geometry hcore/overlap builds, with
 * per-(shell, image) distance culling. Functional equivalent of the
 * reference's grid_ao.c (PBCGTOval_sph_deriv0 + rcut screen), written
 * fresh for this framework's flat shell tables.
 *
 * Real solid harmonics for l = 0..4, libcint spherical ordering
 * (p shells ordered x,y,z; l>=2 ordered m=-l..l).
 *
 * Build:  cc -O3 -fopenmp -shared -fPIC -o libaoeval.so ao_eval.c -lm
 */
#include <math.h>
#include <stdint.h>
#include <string.h>

#define MAX_PRIM 32
#define MAX_CTR 16

static void solid_harmonics(int l, double x, double y, double z, double *out)
{
    const double PI = 3.14159265358979323846;
    switch (l) {
    case 0:
        out[0] = 0.5 / sqrt(PI);
        break;
    case 1: {
        double c = sqrt(3.0 / (4 * PI));
        out[0] = c * x; out[1] = c * y; out[2] = c * z;
        break;
    }
    case 2: {
        double c0 = sqrt(15.0 / (4 * PI));
        double c1 = sqrt(5.0 / (16 * PI));
        double c2 = sqrt(15.0 / (16 * PI));
        out[0] = c0 * x * y;
        out[1] = c0 * y * z;
        out[2] = c1 * (2 * z * z - x * x - y * y);
        out[3] = c0 * x * z;
        out[4] = c2 * (x * x - y * y);
        break;
    }
    case 3: {
        double c_3 = sqrt(35.0 / (32 * PI));
        double c_2 = sqrt(105.0 / (4 * PI));
        double c_1 = sqrt(21.0 / (32 * PI));
        double c0 = sqrt(7.0 / (16 * PI));
        double c2 = sqrt(105.0 / (16 * PI));
        double x2 = x * x, y2 = y * y, z2 = z * z;
        out[0] = c_3 * y * (3 * x2 - y2);
        out[1] = c_2 * x * y * z;
        out[2] = c_1 * y * (4 * z2 - x2 - y2);
        out[3] = c0 * z * (2 * z2 - 3 * x2 - 3 * y2);
        out[4] = c_1 * x * (4 * z2 - x2 - y2);
        out[5] = c2 * z * (x2 - y2);
        out[6] = c_3 * x * (x2 - 3 * y2);
        break;
    }
    case 4: {
        double x2 = x * x, y2 = y * y, z2 = z * z;
        double r2 = x2 + y2 + z2;
        double c_4 = 0.75 * sqrt(35.0 / PI);
        double c_3 = 0.75 * sqrt(35.0 / (2 * PI));
        double c_2 = 0.75 * sqrt(5.0 / PI);
        double c_1 = 0.75 * sqrt(5.0 / (2 * PI));
        double c0 = 3.0 / (16 * sqrt(PI));
        double c2 = 3.0 / 8 * sqrt(5.0 / PI);
        double c4 = 3.0 / 16 * sqrt(35.0 / PI);
        out[0] = c_4 * x * y * (x2 - y2);
        out[1] = c_3 * y * z * (3 * x2 - y2);
        out[2] = c_2 * x * y * (7 * z2 - r2);
        out[3] = c_1 * y * z * (7 * z2 - 3 * r2);
        out[4] = c0 * (35 * z2 * z2 - 30 * z2 * r2 + 3 * r2 * r2);
        out[5] = c_1 * x * z * (7 * z2 - 3 * r2);
        out[6] = c2 * (x2 - y2) * (7 * z2 - r2);
        out[7] = c_3 * x * z * (x2 - 3 * y2);
        out[8] = c4 * (x2 * (x2 - 3 * y2) - y2 * (3 * x2 - y2));
        break;
    }
    }
}

/* Shell table layout (int32 per shell, 6 columns):
 *   l, nprim, nctr, prim_offset, coeff_offset, ao_offset.
 * exps: concatenated primitives; coeffs: concatenated per-shell
 * (nprim x nctr) row-major blocks.
 * rcut2: per-shell squared decay radius for image culling. */
void eval_ao_f64(
    const double *coords,    /* (ng, 3) */
    int64_t ng,
    const int32_t *shtab,    /* (nsh, 6) */
    int64_t nsh,
    const double *exps,
    const double *coeffs,
    const double *centers,   /* (nsh, 3) */
    const double *rcut2,     /* (nsh,) */
    const double *images,    /* (nimg, 3) */
    int64_t nimg,
    int64_t nao,
    double *out)             /* (ng, nao), zero-initialized by caller */
{
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < ng; g++) {
        const double gx = coords[3 * g], gy = coords[3 * g + 1],
                     gz = coords[3 * g + 2];
        double *row = out + g * nao;
        for (int64_t s = 0; s < nsh; s++) {
            const int l = shtab[6 * s];
            const int np = shtab[6 * s + 1];
            const int nc = shtab[6 * s + 2];
            const int po = shtab[6 * s + 3];
            const int co = shtab[6 * s + 4];
            const int ao = shtab[6 * s + 5];
            const int m = 2 * l + 1;
            const double ax = centers[3 * s], ay = centers[3 * s + 1],
                         az = centers[3 * s + 2];
            const double rc2 = rcut2[s];
            double acc[MAX_CTR * 9];
            memset(acc, 0, sizeof(double) * nc * m);
            for (int64_t t = 0; t < nimg; t++) {
                const double dx = gx - ax - images[3 * t];
                const double dy = gy - ay - images[3 * t + 1];
                const double dz = gz - az - images[3 * t + 2];
                const double r2 = dx * dx + dy * dy + dz * dz;
                if (r2 > rc2) continue;
                double gsum[MAX_PRIM];
                for (int p = 0; p < np; p++)
                    gsum[p] = exp(-exps[po + p] * r2);
                double ang[9];
                solid_harmonics(l, dx, dy, dz, ang);
                for (int k = 0; k < nc; k++) {
                    double rad = 0.0;
                    for (int p = 0; p < np; p++)
                        rad += gsum[p] * coeffs[co + p * nc + k];
                    for (int mm = 0; mm < m; mm++)
                        acc[k * m + mm] += rad * ang[mm];
                }
            }
            for (int k = 0; k < nc; k++)
                for (int mm = 0; mm < m; mm++)
                    row[ao + k * m + mm] += acc[k * m + mm];
        }
    }
}
