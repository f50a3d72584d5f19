/* Minimal single-process MPI implementation ("mpistub").
 *
 * Purpose: build and run the reference VPIC (/root/reference) on a host with
 * no MPI development environment, for single-rank head-to-head physics
 * comparisons (10k-step energy drift; BASELINE.md energy axis).  Covers
 * exactly the MPI surface the reference uses (see src/util/mp/DMPPolicy.h):
 * Init/Finalize, comm dup/free/rank/size, Barrier, Allreduce(SUM over
 * double/int), Allgather(int/long long), Gather(char), blocking Send/Recv
 * (int), nonblocking Irecv/Issend (byte) with tag matching + Wait/Get_count,
 * and Abort.
 *
 * Semantics: world size 1, rank 0.  Point-to-point messages are matched
 * in-process on (tag) with FIFO order per tag; sends are buffered (copy at
 * post time) so Issend/Send complete immediately.  A Wait on an unmatched
 * receive is a genuine deadlock and aborts with a message.
 *
 * This is original code, not derived from any MPI implementation.
 */
#ifndef MPISTUB_MPI_H
#define MPISTUB_MPI_H

#ifdef __cplusplus
extern "C" {
#endif

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;

typedef struct MPI_Status {
  int MPI_SOURCE;
  int MPI_TAG;
  int MPI_ERROR;
  int _count_bytes;
} MPI_Status;

typedef struct mpistub_req* MPI_Request;

#define MPI_SUCCESS      0
#define MPI_ERR_OTHER    1

#define MPI_COMM_NULL    0
#define MPI_COMM_WORLD   1
#define MPI_COMM_SELF    2

/* Datatypes encode their size in bytes. */
#define MPI_BYTE         1
#define MPI_CHAR         (-1)       /* also 1 byte; distinct constant */
#define MPI_INT          4
#define MPI_LONG_LONG    8
#define MPI_DOUBLE       (-8)       /* 8 bytes; distinct from LONG_LONG */

#define MPI_SUM          1

#define MPI_STATUS_IGNORE  ((MPI_Status*)0)
#define MPI_STATUSES_IGNORE ((MPI_Status*)0)
#define MPI_IN_PLACE     ((void*)-1)

int MPI_Init( int* argc, char*** argv );
int MPI_Finalize( void );
int MPI_Initialized( int* flag );
int MPI_Abort( MPI_Comm comm, int errorcode );

int MPI_Comm_dup( MPI_Comm comm, MPI_Comm* newcomm );
int MPI_Comm_free( MPI_Comm* comm );
int MPI_Comm_rank( MPI_Comm comm, int* rank );
int MPI_Comm_size( MPI_Comm comm, int* size );

int MPI_Barrier( MPI_Comm comm );
int MPI_Allreduce( const void* sendbuf, void* recvbuf, int count,
                   MPI_Datatype datatype, MPI_Op op, MPI_Comm comm );
int MPI_Allgather( const void* sendbuf, int sendcount, MPI_Datatype sendtype,
                   void* recvbuf, int recvcount, MPI_Datatype recvtype,
                   MPI_Comm comm );
int MPI_Gather( const void* sendbuf, int sendcount, MPI_Datatype sendtype,
                void* recvbuf, int recvcount, MPI_Datatype recvtype,
                int root, MPI_Comm comm );

int MPI_Send( const void* buf, int count, MPI_Datatype datatype, int dest,
              int tag, MPI_Comm comm );
int MPI_Recv( void* buf, int count, MPI_Datatype datatype, int source,
              int tag, MPI_Comm comm, MPI_Status* status );
int MPI_Irecv( void* buf, int count, MPI_Datatype datatype, int source,
               int tag, MPI_Comm comm, MPI_Request* request );
int MPI_Issend( const void* buf, int count, MPI_Datatype datatype, int dest,
                int tag, MPI_Comm comm, MPI_Request* request );
int MPI_Wait( MPI_Request* request, MPI_Status* status );
int MPI_Get_count( const MPI_Status* status, MPI_Datatype datatype,
                   int* count );

#ifdef __cplusplus
}
#endif

#endif /* MPISTUB_MPI_H */
