#!/bin/bash
# Build the reference (SX-Aurora/hypre-ve) sequentially as a numerical
# ORACLE for parity testing.  The fork's VE-specific code (NEC sblas/asl/
# ftrace) does not compile off-VE; this script stubs those APIs with
# abort()-ing shims (they are never called in the configs we validate)
# and fixes one upstream typo.  Nothing is copied into the framework —
# the build lives in /tmp and is used only to print ground-truth numbers.
set -euo pipefail

SRC=/tmp/hypre_build/src
rm -rf /tmp/hypre_build
mkdir -p /tmp/hypre_build
cp -r /root/reference/src "$SRC"

cat > "$SRC/ftrace.h" <<'EOF'
#ifndef FTRACE_STUB_H
#define FTRACE_STUB_H
static inline int ftrace_region_begin(const char *s){(void)s;return 0;}
static inline int ftrace_region_end(const char *s){(void)s;return 0;}
#endif
EOF

cat > "$SRC/sblas.h" <<'EOF'
#ifndef SBLAS_STUB_H
#define SBLAS_STUB_H
#include <stdlib.h>
typedef long sblas_int_t;
typedef long sblas_handle_t;
#define SBLAS_OK 0
#define SBLAS_TRANSPOSE 1
#define SBLAS_NON_TRANSPOSE 0
#define SBLAS_INDEXING_0 0
#define SBLAS_GENERAL 0
static inline sblas_int_t sblas_create_matrix_handle_from_csr_rd(sblas_int_t m,sblas_int_t n,sblas_int_t*ia,sblas_int_t*ja,double*a,sblas_int_t idx,sblas_int_t ty,sblas_handle_t*h){abort();return 0;}
static inline sblas_int_t sblas_analyze_mv_rd(int op,sblas_handle_t h){abort();return 0;}
static inline sblas_int_t sblas_execute_mv_rd(int op,sblas_handle_t h,double al,double*x,double be,double*y){abort();return 0;}
static inline sblas_int_t sblas_destroy_matrix_handle(sblas_handle_t h){abort();return 0;}
#endif
EOF

cat > "$SRC/asl.h" <<'EOF'
#ifndef ASL_STUB_H
#define ASL_STUB_H
#include <stdlib.h>
typedef long asl_sort_t;
#define ASL_SORTORDER_ASCENDING 0
#define ASL_SORTALGORITHM_AUTO_STABLE 0
static inline int asl_library_initialize(void){abort();return 0;}
static inline int asl_library_finalize(void){abort();return 0;}
static inline int asl_sort_create_i32(asl_sort_t*s,int o,int a){abort();return 0;}
static inline int asl_sort_destroy(asl_sort_t s){abort();return 0;}
static inline int asl_sort_preallocate(asl_sort_t s,long n){abort();return 0;}
static inline int asl_sort_execute_i32(asl_sort_t s,long n,const int*k,const long*vi,int*ko,long*vo){abort();return 0;}
#endif
EOF

cd "$SRC"
# upstream typo: reads &II then uses I (complex.h macro)
sed -i '933s/(I-big_base_i/(II-big_base_i/' parcsr_mv/par_csr_matrix.c

python3 - <<'EOF'
# Unguard the VE-only struct members/includes that par_relax.c and
# ParaSails use unconditionally in this fork.
import re

def sub(path, old, new, count=1):
    s = open(path).read()
    assert old in s, (path, old[:40])
    open(path, 'w').write(s.replace(old, new, count))

sub('seq_mv/seq_mv.h', '#ifdef __ve__\n#include <sblas.h>\n#endif', '#include <sblas.h>')
sub('seq_mv/seq_mv.h', '#ifdef __ve__\n   sblas_handle_t hnd;', '   sblas_handle_t hnd;')
sub('seq_mv/seq_mv.h', '   HYPRE_Int max_nnz_row;\n\n#endif\n\n} hypre_CSRMatrix;',
    '   HYPRE_Int max_nnz_row;\n\n} hypre_CSRMatrix;')

s = open('parcsr_ls/par_relax.c').read()
s = s.replace('#ifdef __ve__\n#include <asl.h>', '#include <asl.h>', 1)
# remove the matching #endif three lines later
s = s.replace('#include <sblas.h>\n#endif', '#include <sblas.h>', 1)
open('parcsr_ls/par_relax.c', 'w').write(s)

s = open('distributed_ls/ParaSails/Matrix.h').read()
# unguard every VE block (whitespace inside varies between snapshots):
# drop the #ifdef __ve__ / matching #endif lines, keep the contents
out, depth = [], 0
for line in s.splitlines(keepends=True):
    st = line.strip()
    if st == '#ifdef __ve__':
        depth += 1
        continue
    if depth and st == '#endif':
        depth -= 1
        continue
    out.append(line)
assert depth == 0
open('distributed_ls/ParaSails/Matrix.h', 'w').write(''.join(out))

s = open('distributed_ls/ParaSails/Matrix.c').read()
if '#include <ftrace.h>' not in s:
    s = s.replace('#include "Matrix.h"',
                  '#include <ftrace.h>\n#include "Matrix.h"', 1)
open('distributed_ls/ParaSails/Matrix.c', 'w').write(s)
EOF

./configure --without-MPI --disable-fortran CC=gcc CXX=g++ > /tmp/hypre_configure.log 2>&1
sed -i "s|^INCLUDES =|INCLUDES = -I$SRC|" config/Makefile.config
make -j"$(nproc)" > /tmp/hypre_make.log 2>&1
cd test && make ij struct sstruct > /tmp/hypre_drivers.log 2>&1 || make ij
echo "oracle ready: $SRC/test/ij"
